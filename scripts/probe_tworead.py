"""Microbench: two-stage one-hot read vs the single full-R one-hot (A).

A : one [C, R] one-hot matmul per chunk (production overlap-packed read).
A2: per chunk, (1) fetch a contiguous NR-row window at the chunk's min
    position via a [NR, R] one-hot matmul, (2) the usual [C, NR] one-hot
    read inside the window.  Pure MXU both stages, exact at HIGHEST.
    FLOPs: C*NR*128 + NR*R*128  vs  C*R*128 — wins when NR << R
    (NR = (C*smax + 260) / 124, independent of buffer length).

Shapes: R in {216 (headline fmax-padded), 388 (sampler 48k tone),
775 (granular 96k source)}, smax in {2, 4}; batch 16 and 256.
PROBE_CPU=1 runs the numerics check only.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/phonic_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

FORCE_CPU = os.environ.get("PROBE_CPU") == "1"
if FORCE_CPU:
    jax.config.update("jax_platforms", "cpu")

np.asarray(jax.jit(lambda: jnp.zeros(2))())

HI = jax.lax.Precision.HIGHEST
N = 131072
C = 2048
STRIDE = 124

rng = np.random.default_rng(0)


def pack(src):
    f = src.shape[0]
    r = -(-(f + 3) // STRIDE) + 1
    flat = np.zeros((r - 1) * STRIDE + 128, np.float32)
    flat[:f] = src
    return flat[np.arange(r)[:, None] * STRIDE + np.arange(128)[None, :]]


def mk_positions(batch, frames, smax):
    nc = N // C
    steps = rng.uniform(0.2, smax * 0.95, size=(batch, nc, C)).astype(np.float32)
    base = rng.uniform(2, frames - C * smax - 16,
                       size=(batch, nc, 1)).astype(np.float32)
    pos = base + np.cumsum(steps, -1) - steps
    return pos.reshape(batch, N).astype(np.float32)


def cr_weights(f):
    f2 = f * f
    f3 = f2 * f
    return (f2 - 0.5 * (f + f3), 1.0 - 2.5 * f2 + 1.5 * f3,
            0.5 * f + 2.0 * f2 - 1.5 * f3, 0.5 * (f3 - f2))


def epilogue(win, lo, frac):
    taps = jnp.arange(128, dtype=jnp.int32)
    o = taps[None, :] - lo[:, None]
    w0, w1, w2, w3 = cr_weights(frac[:, None])
    w = (jnp.where(o == 0, w0, 0.0) + jnp.where(o == 1, w1, 0.0)
         + jnp.where(o == 2, w2, 0.0) + jnp.where(o == 3, w3, 0.0))
    return jnp.sum(w * win, axis=1)


def make_read_A(r_rows):
    rows = np.arange(r_rows, dtype=np.int32)

    def read(buf, pos):
        rr = jnp.asarray(rows)

        def chunk(p):
            k = jnp.floor(p)
            frac = p - k
            kil = k.astype(jnp.int32) - 1
            hi = kil // STRIDE
            lo = kil - hi * STRIDE
            oh = (hi[:, None] == rr).astype(jnp.float32)
            win = jnp.matmul(oh, buf, precision=HI)
            return epilogue(win, lo, frac)
        return jax.lax.map(chunk, pos.reshape(-1, C)).reshape(-1)
    return read


def make_read_A2(r_rows, smax):
    nr = (C * smax + 260) // STRIDE + 2
    rows = np.arange(r_rows, dtype=np.int32)

    def read(buf, pos):
        rr = jnp.asarray(rows)
        nri = jnp.arange(nr, dtype=jnp.int32)

        def chunk(p):
            k = jnp.floor(p)
            frac = p - k
            kil = k.astype(jnp.int32) - 1
            arow = jnp.clip(kil[0] // STRIDE, 0, r_rows - nr)
            oh1 = ((arow + nri)[:, None] == rr).astype(jnp.float32)
            w1 = jnp.matmul(oh1, buf, precision=HI)  # [nr, 128]
            kil2 = kil - arow * STRIDE
            hi = kil2 // STRIDE
            lo = kil2 - hi * STRIDE
            oh = (hi[:, None] == nri[None, :]).astype(jnp.float32)
            win = jnp.matmul(oh, w1, precision=HI)
            return epilogue(win, lo, frac)
        return jax.lax.map(chunk, pos.reshape(-1, C)).reshape(-1)
    return read


def run(tag, fn, batch, buf, pos, reps=5):
    jfn = jax.jit(lambda b, p: jax.vmap(lambda q: fn(b, q))(p))
    t0 = time.perf_counter()
    out = jfn(buf, pos)
    jax.block_until_ready(out)
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jfn(buf, pos)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1000.0
    print(json.dumps({f"{tag}_b{batch}_ms": round(ms, 2),
                      f"{tag}_b{batch}_comp_s": round(comp, 1)}), flush=True)


def main():
    from phonic_tpu.ops.resample import hermite_read

    # numerics check at R=216
    frames = 215 * STRIDE - 10
    src = rng.normal(size=(frames,)).astype(np.float32)
    buf = jnp.asarray(pack(src))
    r_rows = buf.shape[0]
    pos_chk = jnp.asarray(mk_positions(2, frames, 2))
    ref = np.asarray(jax.jit(lambda b, p: jax.vmap(
        lambda q: hermite_read(b, q))(p))(jnp.asarray(src), pos_chk))
    for tag, fn in (("A", make_read_A(r_rows)), ("A2", make_read_A2(r_rows, 2))):
        got = np.asarray(jax.jit(lambda b, p, f=fn: jax.vmap(
            lambda q: f(b, q))(p))(buf, pos_chk))
        print(json.dumps({f"maxerr_{tag}": float(np.max(np.abs(got - ref)))}),
              flush=True)
    if FORCE_CPU:
        return

    cases = [(216, 2, (16, 256)), (388, 4, (256,)), (775, 2, (256,))]
    for r_target, smax, batches in cases:
        frames = (r_target - 1) * STRIDE - 10
        src = rng.normal(size=(frames,)).astype(np.float32)
        buf = jnp.asarray(pack(src))
        r_rows = buf.shape[0]
        for batch in batches:
            pos = jnp.asarray(mk_positions(batch, frames, smax))
            run(f"A_R{r_rows}_s{smax}", make_read_A(r_rows), batch, buf, pos)
            run(f"A2_R{r_rows}_s{smax}", make_read_A2(r_rows, smax), batch,
                buf, pos)


main()


# --- appended: chunk-size scaling + two-window (fold-safe) variant ----------
def make_read_A2C(r_rows, smax, c):
    nr = (c * smax + 260) // STRIDE + 2

    def read(buf, pos):
        rr = jnp.arange(r_rows, dtype=jnp.int32)
        nri = jnp.arange(nr, dtype=jnp.int32)

        def chunk(p):
            k = jnp.floor(p)
            frac = p - k
            kil = k.astype(jnp.int32) - 1
            arow = jnp.clip(kil[0] // STRIDE, 0, r_rows - nr)
            oh1 = ((arow + nri)[:, None] == rr[None, :]).astype(jnp.float32)
            w1 = jnp.matmul(oh1, buf, precision=HI)
            kil2 = kil - arow * STRIDE
            hi = kil2 // STRIDE
            lo = kil2 - hi * STRIDE
            oh = (hi[:, None] == nri[None, :]).astype(jnp.float32)
            win = jnp.matmul(oh, w1, precision=HI)
            return epilogue(win, lo, frac)
        return jax.lax.map(chunk, pos.reshape(-1, c)).reshape(-1)
    return read


def make_read_A3(r_rows, smax, c=C):
    # two windows: chunk-min and chunk-max anchored (exact under any fold)
    nr = (c * smax + 260) // STRIDE + 2

    def read(buf, pos):
        rr = jnp.arange(r_rows, dtype=jnp.int32)
        nri = jnp.arange(nr, dtype=jnp.int32)

        def chunk(p):
            k = jnp.floor(p)
            frac = p - k
            kil = k.astype(jnp.int32) - 1
            alo = jnp.clip(jnp.min(kil) // STRIDE, 0, r_rows - nr)
            ahi = jnp.clip(jnp.max(kil) // STRIDE - (nr - 1), 0, r_rows - nr)
            oh1 = (jnp.concatenate([alo + nri, ahi + nri])[:, None]
                   == rr[None, :]).astype(jnp.float32)
            w1 = jnp.matmul(oh1, buf, precision=HI)  # [2nr, 128]
            in_lo = kil < (alo + nr) * STRIDE
            base = jnp.where(in_lo, alo, ahi - nr)
            kil2 = kil - base * STRIDE
            hi = kil2 // STRIDE
            lo = kil2 - hi * STRIDE
            oh = (hi[:, None] == jnp.arange(2 * nr, dtype=jnp.int32)[None, :]
                  ).astype(jnp.float32)
            win = jnp.matmul(oh, w1, precision=HI)
            return epilogue(win, lo, frac)
        return jax.lax.map(chunk, pos.reshape(-1, c)).reshape(-1)
    return read


def extra():
    frames = 215 * STRIDE - 10
    src2 = rng.normal(size=(frames,)).astype(np.float32)
    buf = jnp.asarray(pack(src2))
    r_rows = buf.shape[0]
    from phonic_tpu.ops.resample import hermite_read
    pos_chk = jnp.asarray(mk_positions(2, frames, 2))
    ref = np.asarray(jax.jit(lambda b, p: jax.vmap(
        lambda q: hermite_read(b, q))(p))(jnp.asarray(src2), pos_chk))
    for tag, fn in (("A2C512", make_read_A2C(r_rows, 2, 512)),
                    ("A3", make_read_A3(r_rows, 2))):
        got = np.asarray(jax.jit(lambda b, p, f=fn: jax.vmap(
            lambda q: f(b, q))(p))(buf, pos_chk))
        print(json.dumps({f"maxerr_{tag}": float(np.max(np.abs(got - ref)))}),
              flush=True)
    if FORCE_CPU:
        return
    pos = jnp.asarray(mk_positions(256, frames, 2))
    for c in (1024, 512, 256):
        run(f"A2C{c}_R{r_rows}_s2", make_read_A2C(r_rows, 2, c), 256, buf, pos)
    run(f"A3_R{r_rows}_s2", make_read_A3(r_rows, 2), 256, buf, pos)
    run(f"A3C512_R{r_rows}_s2", make_read_A3(r_rows, 2, 512), 256, buf, pos)


extra()
