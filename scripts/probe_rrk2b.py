"""Incremental v2 kernel probe with progress prints (v1 hung >25 min in the
batch probe — isolate which stage/shape is slow)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

np.asarray(jax.jit(lambda: jnp.zeros(2))())
print("real mode forced", flush=True)

from phonic_tpu.ops import rampread as rr1
import rampread_v2 as rr2
import rampread_v3 as rr3


def mk_case(b, ch, n, frames, smax, seed):
    rng = np.random.default_rng(seed)
    buf = rng.standard_normal((b, ch, frames)).astype(np.float32)
    speed = rng.uniform(0.3, smax * 0.9, size=(b, 1)).astype(np.float32)
    p0 = rng.uniform(0, frames, size=(b, 1)).astype(np.float32)
    pos = (p0 + speed * np.arange(n, dtype=np.float32)[None, :]) % (frames - 4)
    packed = rr1.pack(buf, min_rows=rr1.window_rows(1024, 64))
    smap = np.arange(b, dtype=np.int32)
    return jnp.asarray(packed), jnp.asarray(smap), jnp.asarray(pos)


def timeit(fn, args, min_iters=5, min_secs=1.0):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    print(f"  compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    iters = 0
    t0 = time.perf_counter()
    while True:
        out = fn(*args)
        iters += 1
        if iters >= min_iters and time.perf_counter() - t0 > min_secs:
            break
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000.0, out


SHAPES = {
    "gran_b1000": (1000, 1, 2048, 96000, 4),
    "head_b16": (16, 2, 131072, 48000, 4),
}
MODS = {"v1": rr1, "v2": rr2, "v3": rr3}

for spec in sys.argv[1:]:  # e.g. v2:gran_b1000
    vtag, stag = spec.split(":")
    b, ch, n, frames, smax = SHAPES[stag]
    mod = MODS[vtag]
    packed, smap, pos = mk_case(b, ch, n, frames, smax, 7)
    print(f"{spec}: building...", flush=True)
    fn = jax.jit(lambda p, s, q, m=mod: m.ramp_read(p, s, q, smax, chunk=1024))
    try:
        ms, out = timeit(fn, (packed, smap, pos))
        o = np.asarray(out)
        print(json.dumps({spec: {"ms": round(ms, 2),
                                 "ns_per_pos": round(ms * 1e6 / (b * n), 2),
                                 "checksum": float(np.sum(o * o))}}),
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({spec + "_error": repr(e)[:400]}), flush=True)
