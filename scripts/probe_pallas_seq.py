"""Pallas sequential-follower layout probes: find a legal + fast way to run
a per-sample nonlinear recurrence on this TPU.  Variants:
  a) inputs VMEM, scalar reads ref[0, i], output via where-accumulate vreg
  b) inputs SMEM BlockSpec, scalar reads, output via where-accumulate
  c) like (a) but output stored per-sample via ref[0, i] = (banned? check)
"""
import json
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 131072


def force_real():
    np.asarray(jax.jit(lambda: jnp.zeros(2))())


def timeit(fn, *args, reps=5):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps * 1000.0


force_real()

rng = np.random.default_rng(0)
x_np = rng.uniform(-80, 0, N).astype(np.float32)
x2 = jnp.asarray(x_np)[None, :]
aa_arr = jnp.full((1, N), 0.05, jnp.float32)
ra_arr = jnp.full((1, N), 0.001, jnp.float32)

# reference (numpy)
env = -120.0
ref = np.empty(N, np.float32)
for i in range(N):
    a = 0.05 if x_np[i] > env else 0.001
    env = np.float32(env + a * (x_np[i] - env))
    ref[i] = env


def run(name, make, tc):
    try:
        f = make(tc)
        got = np.asarray(f(x2, aa_arr, ra_arr))[0]
        err = float(np.max(np.abs(got - ref)))
        t = timeit(f, x2, aa_arr, ra_arr)
        print(json.dumps({name: round(t, 3), name + "_err": err}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({name + "_error": repr(e)[:200]}), flush=True)


def make_a(tc):
    def kernel(x_ref, aa_ref, ra_ref, out_ref, carry_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            carry_ref[0] = jnp.float32(-120.0)

        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, tc), 1)

        def body(i, st):
            env, acc = st
            in_db = x_ref[0, i]
            a = jnp.where(in_db > env, aa_ref[0, i], ra_ref[0, i])
            env = env + a * (in_db - env)
            acc = jnp.where(lanes == i, env, acc)
            return env, acc

        env0 = carry_ref[0]
        env, acc = jax.lax.fori_loop(
            0, tc, body, (env0, jnp.zeros((1, tc), jnp.float32)))
        out_ref[:, :] = acc
        carry_ref[0] = env

    @jax.jit
    def f(x, aa, ra):
        spec = pl.BlockSpec((1, tc), lambda i: (0, i), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel, grid=(N // tc,),
            in_specs=[spec, spec, spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
            scratch_shapes=[pltpu.SMEM((1,), jnp.float32)],
        )(x, aa, ra)
    return f


def make_b(tc):
    def kernel(x_ref, aa_ref, ra_ref, out_ref, carry_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            carry_ref[0] = jnp.float32(-120.0)

        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, tc), 1)

        def body(i, st):
            env, acc = st
            in_db = x_ref[0, i]
            a = jnp.where(in_db > env, aa_ref[0, i], ra_ref[0, i])
            env = env + a * (in_db - env)
            acc = jnp.where(lanes == i, env, acc)
            return env, acc

        env, acc = jax.lax.fori_loop(
            0, tc, body, (carry_ref[0], jnp.zeros((1, tc), jnp.float32)))
        out_ref[:, :] = acc
        carry_ref[0] = env

    @jax.jit
    def f(x, aa, ra):
        sspec = pl.BlockSpec((1, tc), lambda i: (0, i), memory_space=pltpu.SMEM)
        vspec = pl.BlockSpec((1, tc), lambda i: (0, i), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel, grid=(N // tc,),
            in_specs=[sspec, sspec, sspec], out_specs=vspec,
            out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
            scratch_shapes=[pltpu.SMEM((1,), jnp.float32)],
        )(x, aa, ra)
    return f


def make_c(tc):
    # per-sample store into SMEM scratch row, then one vector copy out
    def kernel(x_ref, aa_ref, ra_ref, out_ref, carry_ref, row_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            carry_ref[0] = jnp.float32(-120.0)

        def body(i, env):
            in_db = x_ref[0, i]
            a = jnp.where(in_db > env, aa_ref[0, i], ra_ref[0, i])
            env = env + a * (in_db - env)
            row_ref[i] = env
            return env

        env = jax.lax.fori_loop(0, tc, body, carry_ref[0])
        out_ref[:, :] = row_ref[:][None, :]
        carry_ref[0] = env

    @jax.jit
    def f(x, aa, ra):
        spec = pl.BlockSpec((1, tc), lambda i: (0, i), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel, grid=(N // tc,),
            in_specs=[spec, spec, spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
            scratch_shapes=[pltpu.SMEM((1,), jnp.float32),
                            pltpu.SMEM((tc,), jnp.float32)],
        )(x, aa, ra)
    return f


run("pa_vmem_whereacc_2048", make_a, 2048)
run("pb_smem_in_2048", make_b, 2048)
run("pc_smem_row_2048", make_c, 2048)
run("pa_vmem_whereacc_512", make_a, 512)
run("pc_smem_row_8192", make_c, 8192)
