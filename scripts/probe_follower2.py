"""Probe: follower kernel with SMEM output + per-step scalar stores vs the
current vreg lane-mask accumulate (16 vector ops per sample at tc=2048)."""
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
import functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

np.asarray(jax.jit(lambda: jnp.zeros(2))())
print("real mode forced", flush=True)

from phonic_tpu.ops import follower as fo


def _follower_kernel_s(tc, x_ref, aa_ref, ra_ref, env0_ref, out_ref,
                       carry_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        carry_ref[0] = env0_ref[0]

    def body(i, env):
        in_db = x_ref[0, 0, i]
        a = jnp.where(in_db > env, aa_ref[0, 0, i], ra_ref[0, 0, i])
        env = env + a * (in_db - env)
        out_ref[0, 0, i] = env
        return env

    carry_ref[0] = jax.lax.fori_loop(0, tc, body, carry_ref[0])


@functools.partial(jax.jit, static_argnames=("tc",))
def _follower_call_s(x, aa, ra, env0, tc):
    b, n = x.shape
    grid = (b, n // tc)
    smem = pl.BlockSpec((1, 1, tc), lambda b, i: (b, 0, i),
                        memory_space=pltpu.SMEM)
    e0 = pl.BlockSpec((1,), lambda b, i: (b,), memory_space=pltpu.SMEM)
    return pl.pallas_call(
        functools.partial(_follower_kernel_s, tc),
        grid=grid,
        in_specs=[smem, smem, smem, e0],
        out_specs=smem,
        out_shape=jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.float32)],
    )(x[:, None, :], aa[:, None, :], ra[:, None, :], env0)[:, 0, :]


def timeit(fn, args, min_iters=5, min_secs=1.0):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    print(f"  compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    iters = 0
    t0 = time.perf_counter()
    while True:
        out = fn(*args)
        iters += 1
        if iters >= min_iters and time.perf_counter() - t0 > min_secs:
            break
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000.0, out


n = 131072
rng = np.random.default_rng(3)
x = rng.standard_normal((1, n)).astype(np.float32) * 20 - 40
aa = np.full((1, n), 0.01, np.float32)
ra = np.full((1, n), 0.002, np.float32)
env0 = np.asarray([-60.0], np.float32)

try:
    f_new = lambda *a: _follower_call_s(*a, tc=2048)
    ms2, o2 = timeit(f_new, (x, aa, ra, env0))
    f_old = lambda *a: fo._follower_call(*a, tc=2048)
    ms1, o1 = timeit(f_old, (x, aa, ra, env0))
    diff = float(np.max(np.abs(np.asarray(o1) - np.asarray(o2))))
    print(json.dumps({"old_ms": round(ms1, 2), "smem_out_ms": round(ms2, 2),
                      "max_diff": diff}), flush=True)
except Exception as e:  # noqa: BLE001
    print(json.dumps({"error": repr(e)[:500]}), flush=True)
