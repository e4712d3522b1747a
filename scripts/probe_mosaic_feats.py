"""Probe Mosaic-relay support for the rampread-v2 kernel's building blocks:

  1. DMA HBM->VMEM of whole 128-lane rows at a DYNAMIC 8-aligned sublane
     (row) offset taken from SMEM;
  2. dynamic sublane slice of the VMEM scratch at an 8-aligned offset;
  3. in-kernel f32 dot [16,128]@[128,128] (one-hot lane permute on MXU);
  4. iota/compare one-hot builds + sublane reductions.

Each feature is exercised by one tiny kernel; numerics checked vs XLA.
Run ALONE on the TPU:  python scripts/probe_mosaic_feats.py
"""
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

np.asarray(jax.jit(lambda: jnp.zeros(2))())  # force real mode FIRST


def kernel(sl, src_hbm, off_ref, rowsel_ref, lanesel_ref, out_ref, win_ref,
           sem_ref):
    # 1. DMA rows [off, off+32) of src (HBM) into VMEM scratch
    cp = pltpu.make_async_copy(
        src_hbm.at[0, pl.ds(off_ref[0, 0, 0], 32), :],
        win_ref.at[:, :], sem_ref)
    cp.start()
    cp.wait()
    # 2. dynamic sublane slice at a dynamic UNALIGNED offset (from SMEM)
    v16 = win_ref[pl.ds(off_ref[0, 0, 0] - 48 + sl, 16), :]  # [16, 128]
    # 3./4. one-hot lane-permute dot + row select
    lane = lanesel_ref[0, 0, :]          # [128] i32: wanted lane per output
    row = rowsel_ref[0, 0, :]            # [128] i32: wanted row (0..15)
    sub128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    h = (sub128 == lane[None, :]).astype(jnp.float32)   # [128l, 128o]
    b = jax.lax.dot_general(
        v16, h, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)            # [16, 128]
    sub16 = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 0)
    m = (sub16 == row[None, :]).astype(jnp.float32)
    out_ref[0, :] = jnp.sum(b * m, axis=0)


@functools.partial(jax.jit, static_argnames=("sl",))
def run(src, off, rowsel, lanesel, sl):
    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(kernel, sl),
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            smem((1, 1, 1), lambda i: (0, 0, 0)),
            vmem((1, 1, 128), lambda i: (0, 0, 0)),
            vmem((1, 1, 128), lambda i: (0, 0, 0)),
        ],
        out_specs=vmem((1, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((32, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(src, off, rowsel, lanesel)


def main():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(1, 512, 128)).astype(np.float32)
    off = np.full((1, 1, 1), 48, np.int32)  # rows 48..80
    sl = 13                                 # UNALIGNED slice rows 13..29
    rowsel = rng.integers(0, 16, (1, 1, 128)).astype(np.int32)
    lanesel = rng.integers(0, 128, (1, 1, 128)).astype(np.int32)
    got = np.asarray(run(jnp.asarray(src), jnp.asarray(off),
                         jnp.asarray(rowsel), jnp.asarray(lanesel), sl))
    ref = src[0, 48 + sl + rowsel[0, 0], lanesel[0, 0]]
    print(json.dumps({"maxerr": float(np.abs(got[0] - ref).max()),
                      "ok": bool(np.allclose(got[0], ref))}), flush=True)


main()
