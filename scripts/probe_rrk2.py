"""Probe: ramp-read kernel v2 (pure one-hot + 4 rolled dots) vs current
(weighted one-hot build).  Correctness + timing on the two hot shapes:
headline file reads (B=16 stereo) and granular grain reads (B=1000 mono)."""
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

from phonic_tpu.ops import rampread as rr1
import rampread_v2 as rr2


def mk_case(b, ch, n, frames, smax, seed):
    rng = np.random.default_rng(seed)
    buf = rng.standard_normal((b, ch, frames)).astype(np.float32)
    # ramp positions with bounded steps and a mod-fold wrap
    speed = rng.uniform(0.3, smax * 0.9, size=(b, 1)).astype(np.float32)
    p0 = rng.uniform(0, frames, size=(b, 1)).astype(np.float32)
    pos = (p0 + speed * np.arange(n, dtype=np.float32)[None, :]) % (frames - 4)
    packed = rr1.pack(buf, min_rows=rr1.window_rows(1024, 64))
    smap = np.arange(b, dtype=np.int32)
    return jnp.asarray(packed), jnp.asarray(smap), jnp.asarray(pos)


def timeit(fn, *args, min_iters=5, min_secs=1.0):
    out = fn(*args)
    jax.block_until_ready(out)
    iters = 0
    t0 = time.perf_counter()
    while True:
        out = fn(*args)
        iters += 1
        if iters >= min_iters and time.perf_counter() - t0 > min_secs:
            break
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000.0, out


for tag, (b, ch, n, frames, smax) in {
    "headline_b16_st": (16, 2, 131072, 48000, 4),
    "granular_b1000_mono": (1000, 1, 2048, 96000, 4),
}.items():
    packed, smap, pos = mk_case(b, ch, n, frames, smax, 7)
    f1 = jax.jit(lambda p, s, q: rr1.ramp_read(p, s, q, smax, chunk=1024))
    f2 = jax.jit(lambda p, s, q: rr2.ramp_read(p, s, q, smax, chunk=1024))
    try:
        ms1, o1 = timeit(f1, packed, smap, pos)
        ms2, o2 = timeit(f2, packed, smap, pos)
        o1 = np.asarray(o1)
        o2 = np.asarray(o2)
        err = float(np.max(np.abs(o1 - o2)))
        ref = float(np.max(np.abs(o1)))
        print(json.dumps({
            tag: {"v1_ms": round(ms1, 2), "v2_ms": round(ms2, 2),
                  "max_abs_diff": err, "ref_max": ref,
                  "ns_per_pos_v1": round(ms1 * 1e6 / (b * n), 2),
                  "ns_per_pos_v2": round(ms2 * 1e6 / (b * n), 2)}}),
            flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({tag + "_error": repr(e)[:400]}), flush=True)
