"""Window-fetch layout probes: 1-D vmapped dynamic_slice vs row-aligned 2-D
vs a full granular-shaped two-window composite read."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

np.asarray(jax.jit(lambda: jnp.zeros(2))())

N = 131072
G = 100
FRAMES = 96000
R = FRAMES // 128 + 2
rng = np.random.default_rng(0)
buf1 = jnp.asarray(rng.uniform(-1, 1, FRAMES + 8192).astype(np.float32))
buf2 = jnp.asarray(rng.uniform(-1, 1, (R, 128)).astype(np.float32))
starts = jnp.asarray(rng.integers(0, FRAMES - 8192, G).astype(np.int32))


def timeit(fn, *args, reps=3):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps * 1000.0


def emit(k, v):
    print(json.dumps({k: round(float(v), 2)}), flush=True)


def mk_fetch1d(C, W):
    @jax.jit
    def f(buf, starts):
        def step(c, k):
            s = (starts + k) % (FRAMES - W)
            win = jax.vmap(lambda s: jax.lax.dynamic_slice(buf, (s,), (W,)))(s)
            return c, jnp.sum(win, axis=1)
        _, o = jax.lax.scan(step, 0.0, jnp.arange(N // C, dtype=jnp.int32))
        return o[-1]
    return f


def mk_fetch2d(C, W):
    rows = W // 128

    @jax.jit
    def f(buf2, starts):
        def step(c, k):
            r0 = ((starts + k) % (FRAMES - W)) >> 7
            win = jax.vmap(lambda r: jax.lax.dynamic_slice(
                buf2, (r, 0), (rows, 128)))(r0)
            return c, jnp.sum(win, axis=(1, 2))
        _, o = jax.lax.scan(step, 0.0, jnp.arange(N // C, dtype=jnp.int32))
        return o[-1]
    return f


# C=2048, two windows of ~2048*2 samples -> W=4352 each (34 rows)
emit("fetch1d_C2048_W4352_ms", timeit(mk_fetch1d(2048, 4352), buf1, starts))
emit("fetch2d_C2048_rows34_ms", timeit(mk_fetch2d(2048, 4352), buf2, starts))
emit("fetch2d_C2048_rows17_ms", timeit(mk_fetch2d(2048, 2176), buf2, starts))
emit("fetch2d_C512_rows17_ms", timeit(mk_fetch2d(512, 2176), buf2, starts))
