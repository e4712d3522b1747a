"""Probe: Pallas fused grain ramp-read — whole source resident in VMEM,
per-128-output-group row triple via SMEM anchors + weighted 384-wide select.

Positions arrive as data (computed once in XLA, shared bit-identically
with the CPU reference path); per-group row anchors are precomputed in
XLA and staged in SMEM, so the kernel never extracts scalars from vregs
(unsupported on this Mosaic relay).

Measures per-output-sample cost of the primitive that would replace
granular's window fetch (vmapped dynamic_slice ~0.6-1.2 ns/elt) and
one-hot tap matmuls (~1 ns/pos).

Run on TPU (alone):  python scripts/probe_pallas_read.py
"""
import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _read_kernel(c, src_ref, pos_ref, anch_ref, out_ref):
    """One grain per grid step: out[j] = catmull_rom(src, pos[j]) with the
    4 taps of every 128-output group guaranteed inside rows
    [anch[t], anch[t]+3) (the caller's anchor contract)."""
    ngrp = c // LANE
    mu = (jax.lax.broadcasted_iota(jnp.int32, (3, LANE), 1)
          + jax.lax.broadcasted_iota(jnp.int32, (3, LANE), 0) * 128)

    def group(t, _):
        pos = pos_ref[0, pl.ds(t * LANE, LANE)]  # [128]
        k = jnp.floor(pos)
        f = pos - k
        kil = k.astype(jnp.int32) - 1
        r0 = anch_ref[0, t]
        w3 = src_ref[pl.ds(r0, 3), :]  # [3, 128]
        off = kil - r0 * 128  # in [0, 381] by contract
        f2 = f * f
        f3 = f2 * f
        w_m1 = f2 - 0.5 * (f + f3)
        w_y0 = 1.0 - 2.5 * f2 + 1.5 * f3
        w_y1 = 0.5 * f + 2.0 * f2 - 1.5 * f3
        w_y2 = 0.5 * (f3 - f2)
        d = mu[None, :, :] - off[:, None, None]  # [128, 3, 128]
        wsel = jnp.where(d == 0, w_m1[:, None, None], 0.0)
        wsel = jnp.where(d == 1, w_y0[:, None, None], wsel)
        wsel = jnp.where(d == 2, w_y1[:, None, None], wsel)
        wsel = jnp.where(d == 3, w_y2[:, None, None], wsel)
        vals = jnp.sum(wsel * w3[None, :, :], axis=(1, 2))  # [128]
        out_ref[0, pl.ds(t * LANE, LANE)] = vals
        return 0

    jax.lax.fori_loop(0, ngrp, group, 0, unroll=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_read(src_rows, fidx, anchors, interpret=False):
    g, c = fidx.shape
    return pl.pallas_call(
        functools.partial(_read_kernel, c),
        grid=(g,),
        in_specs=[
            pl.BlockSpec(src_rows.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c // LANE), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, c), jnp.float32),
        interpret=interpret,
    )(src_rows, fidx, anchors)


def make_anchors(fidx, nrows):
    """Per-128-group leftmost tap row, clipped so rows r..r+2 exist."""
    g, c = fidx.shape
    kil = jnp.floor(fidx).astype(jnp.int32) - 1
    kmin = jnp.min(kil.reshape(g, c // LANE, LANE), axis=-1)
    return jnp.clip(kmin >> 7, 0, nrows - 3).astype(jnp.int32)


def oracle(src, fidx):
    k = jnp.floor(fidx)
    f = fidx - k
    i1 = k.astype(jnp.int32)
    y0 = src[i1 - 1]
    y1 = src[i1]
    y2 = src[i1 + 1]
    y3 = src[i1 + 2]
    a = -0.5 * y0 + 1.5 * y1 - 1.5 * y2 + 0.5 * y3
    b = y0 - 2.5 * y1 + 2.0 * y2 - 0.5 * y3
    cc = -0.5 * y0 + 0.5 * y2
    return ((a * f + b) * f + cc) * f + y1


def main():
    np.asarray(jax.jit(lambda: jnp.zeros(2))())  # force real mode FIRST
    rng = np.random.default_rng(7)
    frames = 96000
    rows = (frames + 4 * LANE) // LANE + 1
    src = rng.normal(size=(rows * LANE,)).astype(np.float32)
    src_rows = jnp.asarray(src.reshape(rows, LANE))

    def posgrid(g, c):
        p0 = rng.uniform(200.0, frames - 1.0 * c - 8, g).astype(np.float32)
        inc = rng.uniform(0.3, 1.0, g).astype(np.float32)
        j = np.arange(c, dtype=np.float32)
        return jnp.asarray(p0[:, None] + j[None, :] * inc[:, None])

    G, C = 100, 2048
    fidx = posgrid(G, C)
    anch = make_anchors(fidx, rows)
    want = np.asarray(oracle(jnp.asarray(src), fidx))
    got = np.asarray(pallas_read(src_rows, fidx, anch))
    print(json.dumps({"maxerr": float(np.max(np.abs(got - want)))}),
          flush=True)

    for g, c, reps in ((100, 2048, 20), (100, 8192, 10), (1000, 2048, 5),
                       (100, 16384, 5)):
        fidx = posgrid(g, c)
        anch = make_anchors(fidx, rows)
        t0 = time.perf_counter()
        out = pallas_read(src_rows, fidx, anch)
        jax.block_until_ready(out)
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            out = pallas_read(src_rows, fidx, anch)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        print(json.dumps({
            f"G{g}_C{c}_ms": round(dt * 1e3, 3),
            f"G{g}_C{c}_ns_per_pos": round(dt * 1e9 / (g * c), 3),
            f"G{g}_C{c}_comp_s": round(comp, 1)}), flush=True)


if __name__ == "__main__":
    main()
