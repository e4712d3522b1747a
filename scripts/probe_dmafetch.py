"""Probe: can this Mosaic relay do dynamic-offset DMA fetches (the fast path
for per-grain window fetches)?  Copies M row-windows of NR 128-lane rows
from an HBM-resident [R, 128] source at dynamic row anchors.

P1: grid (M,), one make_async_copy per step from src.at[pl.ds(anchor, NR)].
Compares against jnp.take row-gather for correctness, and times both at the
granular shape (M = 6400 windows/block-voice, NR = 68-row bands and NR = 7
neighborhoods).
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

FORCE_CPU = os.environ.get("PROBE_CPU") == "1"
if FORCE_CPU:
    jax.config.update("jax_platforms", "cpu")

np.asarray(jax.jit(lambda: jnp.zeros(2))())

R = 768  # 96k-frame source in 128-rows
rng = np.random.default_rng(0)
src = jnp.asarray(rng.normal(size=(R, 128)).astype(np.float32))


def _interp():
    return jax.default_backend() not in ("tpu", "axon")


def _fetch_kernel(nr, anchors_ref, src_ref, out_ref, sem):
    m = pl.program_id(0)
    a = anchors_ref[m]
    cp = pltpu.make_async_copy(src_ref.at[pl.ds(a, nr)], out_ref.at[0], sem)
    cp.start()
    cp.wait()


@functools.partial(jax.jit, static_argnames=("nr",))
def dma_fetch(src, anchors, nr):
    m = anchors.shape[0]
    return pl.pallas_call(
        functools.partial(_fetch_kernel, nr),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, nr, 128), lambda i, *_: (i, 0, 0)),
            scratch_shapes=[pltpu.SemaphoreType.DMA],
        ),
        out_shape=jax.ShapeDtypeStruct((m, nr, 128), jnp.float32),
        interpret=_interp(),
    )(anchors, src)


@functools.partial(jax.jit, static_argnames=("nr",))
def take_fetch(src, anchors, nr):
    ridx = anchors[:, None] + jnp.arange(nr, dtype=jnp.int32)[None, :]
    return jnp.take(src, ridx.reshape(-1), axis=0).reshape(
        anchors.shape[0], nr, 128)


def timeit(fn, *args, reps=5):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1000.0, comp, out


for m, nr in ((6400, 7), (6400, 68), (1600, 68)):
    anchors = jnp.asarray(
        rng.integers(0, R - nr, size=(m,)).astype(np.int32))
    try:
        ms, comp, out = timeit(dma_fetch, src, anchors, nr)
        ref = take_fetch(src, anchors, nr)
        err = float(jnp.max(jnp.abs(out - ref)))
        print(json.dumps({f"dma_m{m}_nr{nr}_ms": round(ms, 2),
                          f"dma_m{m}_nr{nr}_comp_s": round(comp, 1),
                          f"dma_m{m}_nr{nr}_err": err}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({f"dma_m{m}_nr{nr}_error": repr(e)[:300]}),
              flush=True)
    try:
        ms, comp, _ = timeit(take_fetch, src, anchors, nr)
        print(json.dumps({f"take_m{m}_nr{nr}_ms": round(ms, 2),
                          f"take_m{m}_nr{nr}_comp_s": round(comp, 1)}),
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({f"take_m{m}_nr{nr}_error": repr(e)[:300]}),
              flush=True)
