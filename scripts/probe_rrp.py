"""Probe: ops/rampread.py Pallas kernel on the real TPU.

Correctness vs hermite_read at one small shape, then time-bounded timing
(bench.py loop shape: min_iters AND min elapsed) at the engine shapes:
  B=16, N=131072  (mixer graph: 16 file sources)
  B=64, N=131072  (sampler voices)
  B=1000, N=131072 smax=2 mono (granular grain lanes, upper bound)

Run ALONE on the TPU:  python scripts/probe_rrp.py [B N smax ch ...]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from phonic_tpu.ops import rampread as rr
from phonic_tpu.ops.resample import hermite_read

np.asarray(jax.jit(lambda: jnp.zeros(2))())  # force real mode FIRST

rng = np.random.default_rng(0)


def mk(b, n, frames, smax, ch, folds=True):
    src = rng.normal(size=(max(b // 4, 1), ch, frames)).astype(np.float32)
    packed = jnp.asarray(rr.pack(src, min_rows=rr.window_rows(2048, smax)))
    smap = (np.arange(b) % src.shape[0]).astype(np.int32)
    steps = rng.uniform(0.1, smax, size=(b, n)).astype(np.float32)
    pos = np.cumsum(steps, -1) + rng.uniform(0, 50, (b, 1))
    if folds:
        length = frames - 60.0
        pos = 50.0 + np.mod(pos - 50.0, length)
    return packed, smap, jnp.asarray(pos.astype(np.float32)), src


def timeit(fn, *args, min_iters=8, min_secs=1.0):
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
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    # correctness on-device (small shape)
    packed, smap, pos, src = mk(4, 8192, 12000, 2, 2)
    got = np.asarray(rr.ramp_read(packed, smap, pos, smax=2))
    ref = np.stack([np.asarray(hermite_read(jnp.asarray(src[smap[i]]),
                                            pos[i])) for i in range(4)])
    print(json.dumps({"maxerr": float(np.abs(got - ref).max())}), flush=True)

    shapes = [(16, 131072, 2, 2, 1024), (64, 131072, 2, 2, 1024),
              (1000, 131072, 4, 1, 1024)]
    if len(sys.argv) > 1:
        a = [int(x) for x in sys.argv[1:]]
        shapes = [tuple(a[i:i + 5]) for i in range(0, len(a), 5)]
    for b, n, smax, ch, chunk in shapes:
        packed, smap, pos, _ = mk(b, n, 24000, smax, ch)
        fn = jax.jit(lambda pk, sm, p, s=smax, c=chunk: rr.ramp_read(
            pk, sm, p, smax=s, chunk=c))
        t0 = time.perf_counter()
        try:
            ms = timeit(fn, packed, smap, pos)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({f"B{b}_ch{ch}_c{chunk}_error": repr(e)[:300]}),
                  flush=True)
            continue
        print(json.dumps({
            f"B{b}_ch{ch}_c{chunk}_ms": round(ms, 2),
            f"B{b}_ch{ch}_c{chunk}_ns_per_pos": round(ms * 1e6 / (b * n), 3),
            f"B{b}_ch{ch}_c{chunk}_total_s": round(
                time.perf_counter() - t0, 1)}), flush=True)


main()
