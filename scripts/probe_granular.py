"""Granular read-path probes: windowed one-hot row-matmul reads vs the
per-element gather baseline, at production shapes (G=100 grains,
n=131072 block, chunked scan)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

np.asarray(jax.jit(lambda: jnp.zeros(2))())  # real mode

N = 131072
G = 100
FRAMES = 96000
rng = np.random.default_rng(0)
buf = jnp.asarray(rng.uniform(-1, 1, FRAMES + 512).astype(np.float32))
pos0 = jnp.asarray((rng.uniform(0.05, 0.9, G) * FRAMES).astype(np.float32))
# speeds in [-1.5, 1.5] like the bench's note range
spd = jnp.asarray(rng.uniform(0.4, 1.5, G).astype(np.float32)
                  * np.where(rng.uniform(size=G) < 0.2, -1, 1))


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


def cr_weights(frac):
    f = frac
    f2 = f * f
    f3 = f2 * f
    return (f2 - 0.5 * (f + f3), 1.0 - 2.5 * f2 + 1.5 * f3,
            0.5 * f + 2.0 * f2 - 1.5 * f3, 0.5 * (f3 - f2))


def make_gather(C):
    @jax.jit
    def f(buf, pos0, spd):
        def step(c, k):
            t0 = (k * C).astype(jnp.float32)
            j = t0 + jnp.arange(C, dtype=jnp.float32)
            fidx = pos0[:, None] + j[None, :] * spd[:, None]
            fidx = jnp.mod(fidx, FRAMES - 1.0)
            i1 = fidx.astype(jnp.int32)
            frac = fidx - i1
            w = cr_weights(frac)
            acc = 0.0
            for m in range(4):
                acc += w[m] * buf[jnp.clip(i1 + m - 1, 0, FRAMES - 1)]
            return c, jnp.sum(acc, axis=0)
        _, o = jax.lax.scan(step, 0.0, jnp.arange(N // C, dtype=jnp.int32))
        return o[-1]
    return f


def make_windowed(C, smax, precision):
    rows = (C * smax) // 128 + 3  # window rows incl. 4-tap guard
    W = rows * 128

    @jax.jit
    def f(buf, pos0, spd):
        rr = jnp.arange(rows - 1, dtype=jnp.int32)
        taps = jnp.arange(256, dtype=jnp.int32)

        def step(c, k):
            t0 = (k * C).astype(jnp.float32)
            j = t0 + jnp.arange(C, dtype=jnp.float32)
            fidx = pos0[:, None] + j[None, :] * spd[:, None]  # [G, C] unwrapped
            # probe: ignore circular wrap; clamp windows in-range
            f0 = jnp.min(fidx, axis=1)
            w0 = jnp.clip(f0.astype(jnp.int32) - 8, 0, FRAMES - W)
            rel = fidx - w0[:, None].astype(jnp.float32)
            win = jax.vmap(
                lambda s: jax.lax.dynamic_slice(buf, (s,), (W,)))(w0)
            win2 = win.reshape(G, rows, 128)
            ki = rel.astype(jnp.int32)
            frac = rel - ki
            hi = ki >> 7
            lo = ki & 127
            oh = (hi[:, :, None] == rr[None, None, :]).astype(jnp.float32)
            w0m = jnp.einsum("gcr,grl->gcl", oh, win2[:, :-1],
                             precision=precision)
            w1m = jnp.einsum("gcr,grl->gcl", oh, win2[:, 1:],
                             precision=precision)
            wcat = jnp.concatenate([w0m, w1m], axis=-1)  # [G, C, 256]
            o = taps[None, None, :] - lo[:, :, None]
            wts = cr_weights(frac)
            wmat = (jnp.where(o == 0, wts[0][:, :, None], 0.0)
                    + jnp.where(o == 1, wts[1][:, :, None], 0.0)
                    + jnp.where(o == 2, wts[2][:, :, None], 0.0)
                    + jnp.where(o == 3, wts[3][:, :, None], 0.0))
            vals = jnp.sum(wmat * wcat, axis=-1)  # [G, C]
            return c, jnp.sum(vals, axis=0)
        _, o = jax.lax.scan(step, 0.0, jnp.arange(N // C, dtype=jnp.int32))
        return o[-1]
    return f, rows


def make_rowfetch_only(C, smax):
    rows = (C * smax) // 128 + 3
    W = rows * 128

    @jax.jit
    def f(buf, pos0, spd):
        def step(c, k):
            t0 = (k * C).astype(jnp.float32)
            f0 = pos0 + t0 * spd
            w0 = jnp.clip(f0.astype(jnp.int32) - 8, 0, FRAMES - W)
            win = jax.vmap(
                lambda s: jax.lax.dynamic_slice(buf, (s,), (W,)))(w0)
            return c, jnp.sum(win, axis=1)
        _, o = jax.lax.scan(step, 0.0, jnp.arange(N // C, dtype=jnp.int32))
        return o[-1]
    return f


emit("gather_C2048_ms", timeit(make_gather(2048), buf, pos0, spd))

fw = make_rowfetch_only(512, 2)
emit("rowfetch_C512_ms", timeit(fw, buf, pos0, spd))

for C, smax, prec, tag in (
        (512, 2, jax.lax.Precision.HIGHEST, "C512_hi"),
        (2048, 2, jax.lax.Precision.HIGHEST, "C2048_hi"),
        (512, 2, jax.lax.Precision.DEFAULT, "C512_def"),
        (128, 2, jax.lax.Precision.HIGHEST, "C128_hi")):
    try:
        f, rows = make_windowed(C, smax, prec)
        emit(f"win_{tag}_rows{rows}_ms", timeit(f, buf, pos0, spd))
    except Exception as e:  # noqa: BLE001
        print(json.dumps({f"win_{tag}_error": repr(e)[:200]}), flush=True)

# correctness spot-check: windowed vs gather (same math, no wrap in range)
g = np.asarray(make_gather(512)(buf, pos0 * 0 + 1000.0, jnp.abs(spd)))
w = np.asarray(make_windowed(512, 2, jax.lax.Precision.HIGHEST)[0](
    buf, pos0 * 0 + 1000.0, jnp.abs(spd)))
emit("win_vs_gather_maxerr", float(np.max(np.abs(g - w))))
