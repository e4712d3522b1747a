"""Microbench: ramp-read formulations for the FileSource/sampler hot path.

The round-4 overlap-packed one-hot read (resample.hermite_read_mm) costs
C x R x 128 MXU MACs per chunk (selection-by-matmul is invariant in row
width: C x buffer_elements).  For RAMP positions (|dpos| <= smax per output
sample) a 128-lane output group only touches a ~128*smax-sample source
neighborhood, so the selection can go hierarchical:

  B. per-group row-neighborhood fetch via a [A, R8] one-hot matmul
     (A = C/group anchors, NR row-shifted matmuls), then a fused
     mask-reduce epilogue over the [A, group, W] window (VPU, no gathers).
  D. same epilogue, fetch via jnp.take of whole 128-rows (tests whether
     row-granular gathers beat element gathers on this backend).

Baseline A = the production overlap-packed read (one [C, R] one-hot matmul
+ 4-term 128-lane epilogue).

Run ALONE on the TPU.  Shapes: 16k-frame source, 131072 positions per
batch element, batch 16 (headline x1: 16 sources) and 256 (16 lanes).
PROBE_CPU=1 runs only the numerics check on CPU.
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

np.asarray(jax.jit(lambda: jnp.zeros(2))())  # real mode

HI = jax.lax.Precision.HIGHEST
F = 16384            # source frames
N = 131072           # positions per batch element
C = 2048             # chunk
SMAX = 4             # position step bound

rng = np.random.default_rng(0)
src = rng.normal(size=(F,)).astype(np.float32)


def mk_positions_ramp(batch):
    """Per-chunk ramps from random bases, steps in [0.3, 2.0]."""
    nc = N // C
    steps = rng.uniform(0.3, 2.0, size=(batch, nc, C)).astype(np.float32)
    base = rng.uniform(2, F - 2 * C * 2.0 - 16,
                       size=(batch, nc, 1)).astype(np.float32)
    pos = base + np.cumsum(steps, -1) - steps
    return pos.reshape(batch, N).astype(np.float32)


# --- packings (host) -------------------------------------------------------
STRIDE = 124
R_OVL = -(-(F + 3) // STRIDE) + 1
_f = np.zeros((R_OVL - 1) * STRIDE + 128, np.float32)
_f[:F] = src
src_ovl = _f[np.arange(R_OVL)[:, None] * STRIDE + np.arange(128)[None, :]]

R8 = -(-F // 128) + SMAX + 4  # non-overlapping 128-rows + guard rows
_g = np.zeros(R8 * 128, np.float32)
_g[:F] = src
src_rows = _g.reshape(R8, 128)


def cr_weights(f):
    f2 = f * f
    f3 = f2 * f
    return (f2 - 0.5 * (f + f3), 1.0 - 2.5 * f2 + 1.5 * f3,
            0.5 * f + 2.0 * f2 - 1.5 * f3, 0.5 * (f3 - f2))


# --- A: production overlap-packed read -------------------------------------
def read_A(buf_ovl, pos):
    rows = jnp.arange(R_OVL, dtype=jnp.int32)
    taps = jnp.arange(128, dtype=jnp.int32)

    def chunk(p):
        k = jnp.floor(p)
        frac = p - k
        kil = k.astype(jnp.int32) - 1
        hi = kil // STRIDE
        lo = kil - hi * STRIDE
        oh = (hi[:, None] == rows).astype(jnp.float32)
        win = jnp.matmul(oh, buf_ovl, precision=HI)  # [C, 128]
        o = taps[None, :] - lo[:, None]
        w0, w1, w2, w3 = cr_weights(frac[:, None])
        w = (jnp.where(o == 0, w0, 0.0) + jnp.where(o == 1, w1, 0.0)
             + jnp.where(o == 2, w2, 0.0) + jnp.where(o == 3, w3, 0.0))
        return jnp.sum(w * win, axis=1)

    return jax.lax.map(chunk, pos.reshape(-1, C)).reshape(-1)


# --- B/D: hierarchical group reads ------------------------------------------
def _epilogue(V, pg, arow, W):
    tt = jnp.arange(W, dtype=jnp.int32)
    k = jnp.floor(pg)
    frac = pg - k
    o = k.astype(jnp.int32) - 1 - (arow << 7)[:, None]  # [A, group]
    w0, w1, w2, w3 = cr_weights(frac[..., None])
    om = o[..., None] - tt[None, None, :]
    w = (jnp.where(om == 0, w0, 0.0) + jnp.where(om == -1, w1, 0.0)
         + jnp.where(om == -2, w2, 0.0) + jnp.where(om == -3, w3, 0.0))
    return jnp.sum(w * V[:, None, :], axis=-1).reshape(-1)


def make_read_B(group):
    A = C // group
    NR = (group * SMAX + 136 + 255) // 128
    W = NR * 128

    def chunk_of(buf_rows):
        rr = jnp.arange(R8 - NR + 1, dtype=jnp.int32)

        def chunk(p):
            pg = p.reshape(A, group)
            anchor = jnp.floor(pg[:, 0]).astype(jnp.int32) - 2
            arow = jnp.clip(anchor >> 7, 0, R8 - NR)
            oh = (arow[:, None] == rr[None, :]).astype(jnp.float32)
            V = jnp.stack([
                jnp.matmul(oh, buf_rows[kk:kk + R8 - NR + 1], precision=HI)
                for kk in range(NR)], axis=1).reshape(A, W)
            return _epilogue(V, pg, arow, W)
        return chunk

    def read(buf_rows, pos):
        return jax.lax.map(chunk_of(buf_rows), pos.reshape(-1, C)).reshape(-1)
    return read


def make_read_D(group):
    A = C // group
    NR = (group * SMAX + 136 + 255) // 128
    W = NR * 128

    def read(buf_rows, pos):
        def chunk(p):
            pg = p.reshape(A, group)
            anchor = jnp.floor(pg[:, 0]).astype(jnp.int32) - 2
            arow = jnp.clip(anchor >> 7, 0, R8 - NR)
            ridx = arow[:, None] + jnp.arange(NR, dtype=jnp.int32)[None, :]
            V = jnp.take(buf_rows, ridx.reshape(-1), axis=0).reshape(A, W)
            return _epilogue(V, pg, arow, W)
        return jax.lax.map(chunk, pos.reshape(-1, C)).reshape(-1)
    return read


def run(tag, fn, batch, buf, reps=5):
    pos = jnp.asarray(mk_positions_ramp(batch))
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
    src_ovl_j = jnp.asarray(src_ovl)
    src_rows_j = jnp.asarray(src_rows)
    src_j = jnp.asarray(src)

    from phonic_tpu.ops.resample import hermite_read
    pos_chk = jnp.asarray(mk_positions_ramp(2))
    ref = np.asarray(jax.jit(
        lambda b, p: jax.vmap(lambda q: hermite_read(b, q))(p))(src_j, pos_chk))
    for tag, buf, fn in (("A", src_ovl_j, read_A),
                         ("B128", src_rows_j, make_read_B(128)),
                         ("B64", src_rows_j, make_read_B(64)),
                         ("B32", src_rows_j, make_read_B(32)),
                         ("D128", src_rows_j, make_read_D(128))):
        got = np.asarray(jax.jit(
            lambda b, p, f=fn: jax.vmap(lambda q: f(b, q))(p))(buf, pos_chk))
        print(json.dumps({f"maxerr_{tag}": float(np.max(np.abs(got - ref)))}),
              flush=True)

    if FORCE_CPU:
        return
    batches = [int(b) for b in sys.argv[1:]] or [16, 256]
    for batch in batches:
        run("A_ovl", read_A, batch, src_ovl_j)
        for g in (128, 64, 32):
            run(f"B{g}", make_read_B(g), batch, src_rows_j)
        run("D128", make_read_D(128), batch, src_rows_j)


main()
