"""Does a scan-carried buffer update in place on this backend, or copy the
whole buffer per step?  Carries an [8, 2, H+N] buffer (reverb-shaped) and
updates b frames per step vs a rolling-window carry [8, 2, H+b]."""
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
H = 8192
B = 1024
STEPS = N // B


def timeit(fn, *args, reps=5):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps * 1000.0


@jax.jit
def big_carry(x):
    big = jnp.zeros((8, 2, H + N), jnp.float32)

    def step(big, k):
        t0 = k * B
        win = jax.lax.dynamic_slice(big, (0, 0, t0), (8, 2, H + B))
        w = jnp.sum(win, axis=-1, keepdims=True) * 1e-6 + x[None, None, :B]
        big = jax.lax.dynamic_update_slice(
            big, jnp.broadcast_to(w[..., :1], (8, 2, B)) + w * 0,
            (0, 0, H + t0))
        return big, jnp.sum(w)

    big, ys = jax.lax.scan(step, big, jnp.arange(STEPS, dtype=jnp.int32))
    return ys


@jax.jit
def rolling_carry(x):
    win = jnp.zeros((8, 2, H + B), jnp.float32)

    def step(win, k):
        w = jnp.sum(win, axis=-1, keepdims=True) * 1e-6 + x[None, None, :B]
        wr = jnp.broadcast_to(w[..., :1], (8, 2, B)) + w * 0
        win = jnp.concatenate([win[..., B:], wr], axis=-1)
        return win, jnp.sum(w)

    win, ys = jax.lax.scan(step, win, jnp.arange(STEPS, dtype=jnp.int32))
    return ys


x = jnp.ones((N,), jnp.float32)
print(json.dumps({"big_carry_ms": round(timeit(big_carry, x), 2)}), flush=True)
print(json.dumps({"rolling_ms": round(timeit(rolling_carry, x), 2)}), flush=True)

vb = jax.jit(jax.vmap(lambda x: big_carry(x)))
vr = jax.jit(jax.vmap(lambda x: rolling_carry(x)))
x16 = jnp.ones((16, N), jnp.float32)
print(json.dumps({"big_carry_x16_ms": round(timeit(vb, x16), 2)}), flush=True)
print(json.dumps({"rolling_x16_ms": round(timeit(vr, x16), 2)}), flush=True)
