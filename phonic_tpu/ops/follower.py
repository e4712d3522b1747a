"""Per-sample nonlinear dynamics recurrences: asymmetric envelope follower
and the gate state machine.

Behavioural spec: reference src/effect/compressor.rs (dB-domain
attack/release follower, :283-301) and src/effect/gate.rs (envelope ->
open/hold/closed machine -> gain smoothing, :147-195).

These recurrences branch on the carried state (attack vs release is chosen
by comparing the input to the running envelope), so unlike the linear
smoothers in ops/scan.py they cannot ride an associative scan.  XLA's
sequential ``lax.scan`` costs ~1.5 us per step on this TPU regardless of
unroll (131072-sample block: ~200 ms for the follower, ~440 ms for the
gate).  The Pallas kernels below run the same per-sample loop on the
scalar core with inputs staged in SMEM and each step's output written as a
scalar SMEM store (the earlier lane-mask vreg accumulate spent tc/128
vector ops per sample; SMEM stores measured 1.7x faster standalone,
bit-identical — scripts/probe_follower2.py).

Routing: f32 + TPU backend + block >= _MIN_N -> Pallas; anything else
(CPU tests, float64 strict renders) -> the XLA scan.  Equivalence is
pinned by tests/test_follower.py in interpret mode on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MIN_N = 4096  # below this the XLA scan's ~1.5 us/step is cheap enough
_LANE = 128


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _interpret() -> bool:
    return not _on_tpu()


# ---------------------------------------------------------------------------
# asymmetric one-pole follower: env' = env + a * (in - env),
# a = aa if in > env else ra            (compressor.rs:283-301)
# ---------------------------------------------------------------------------


def _follower_kernel(tc, x_ref, aa_ref, ra_ref, env0_ref, out_ref, carry_ref):
    # per-step scalar store into an SMEM output block: the previous
    # formulation accumulated each step into a [1, tc] vreg via lane-mask
    # select (tc/128 vector ops PER SAMPLE) — measured 44 -> 25.7 ms per
    # 131072-sample block standalone, bit-identical (probe_follower2)
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
def _follower_call(x, aa, ra, env0, tc):
    b, n = x.shape
    grid = (b, n // tc)
    smem = pl.BlockSpec((1, 1, tc), lambda b, i: (b, 0, i),
                        memory_space=pltpu.SMEM)
    e0 = pl.BlockSpec((1,), lambda b, i: (b,), memory_space=pltpu.SMEM)
    return pl.pallas_call(
        functools.partial(_follower_kernel, tc),
        grid=grid,
        in_specs=[smem, smem, smem, e0],
        out_specs=smem,
        out_shape=jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.float32)],
        interpret=_interpret(),
    )(x[:, None, :], aa[:, None, :], ra[:, None, :], env0)[:, 0, :]


def _follower_xla(in_db, aa, ra, env0):
    def step(env, xs):
        in_db, aa, ra = xs
        a = jnp.where(in_db > env, aa, ra)
        env = env + a * (in_db - env)
        return env, env

    env_end, envelope = jax.lax.scan(step, env0, (in_db, aa, ra), unroll=64)
    return env_end, envelope


def _pad_to(x, n_pad):
    n = x.shape[-1]
    if n == n_pad:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n_pad - n)])


def _chunk_for(n):
    # SMEM budget: 3 staged input blocks x 4 bytes x double buffering; 2048
    # measured safe with 3 inputs. Must divide the padded block.
    tc = 2048
    while n % tc:
        tc //= 2
    return tc


def asym_follower(in_db, attack_a, release_a, env0):
    """dB-domain attack/release follower over one block.

    in_db/attack_a/release_a: [n] f32; env0: scalar.
    Returns (env_end, envelope[n]).  Pallas on TPU f32; XLA scan otherwise.
    """
    n = in_db.shape[-1]
    use_pallas = (_on_tpu() and in_db.dtype == jnp.float32 and n >= _MIN_N
                  and n % _LANE == 0)
    if not use_pallas:
        return _follower_xla(in_db, attack_a, release_a, env0)
    tc = _chunk_for(n)
    env = _follower_call(in_db[None], attack_a[None], release_a[None],
                         env0[None], tc)[0]
    return env[-1], env


# ---------------------------------------------------------------------------
# gate machine (gate.rs:147-195): follower + open/hold/closed + gain smooth
# ---------------------------------------------------------------------------


def _gate_kernel(tc, x_ref, aa_ref, ra_ref, thr_ref, rng_ref, hs_ref,
                 st0_ref, out_ref, st_ref, carry_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        carry_ref[0] = st0_ref[0, 0]
        carry_ref[1] = st0_ref[0, 1]
        carry_ref[2] = st0_ref[0, 2]

    def body(i, st):
        env, hold, gain_db = st
        in_db = x_ref[0, 0, i]
        aa = aa_ref[0, 0, i]
        ra = ra_ref[0, 0, i]
        a = jnp.where(in_db > env, aa, ra)
        env = env + a * (in_db - env)
        is_open = env >= thr_ref[0, 0, i]
        target = jnp.where(is_open | (hold > 0), 0.0, rng_ref[0, 0, i])
        hold = jnp.where(is_open, hs_ref[0, 0, i],
                         jnp.maximum(hold - 1.0, 0.0))
        a2 = jnp.where(target > gain_db, aa, ra)
        gain_db = gain_db + a2 * (target - gain_db)
        out_ref[0, 0, i] = gain_db  # scalar SMEM store (see follower)
        return env, hold, gain_db

    env, hold, gain_db = jax.lax.fori_loop(
        0, tc, body, (carry_ref[0], carry_ref[1], carry_ref[2]))
    carry_ref[0] = env
    carry_ref[1] = hold
    carry_ref[2] = gain_db
    # final state rides a small second output, overwritten every chunk;
    # the last chunk's values survive
    st_ref[0, 0] = env
    st_ref[0, 1] = hold
    st_ref[0, 2] = gain_db


@functools.partial(jax.jit, static_argnames=("tc",))
def _gate_call(x, aa, ra, thr, rng, hs, st0, tc):
    b, n = x.shape
    grid = (b, n // tc)
    smem = pl.BlockSpec((1, 1, tc), lambda b, i: (b, 0, i),
                        memory_space=pltpu.SMEM)
    s0 = pl.BlockSpec((1, 3), lambda b, i: (b, 0), memory_space=pltpu.SMEM)
    sts = pl.BlockSpec((1, 3), lambda b, i: (b, 0), memory_space=pltpu.SMEM)
    args = [v[:, None, :] for v in (x, aa, ra, thr, rng, hs)]
    gains, st = pl.pallas_call(
        functools.partial(_gate_kernel, tc),
        grid=grid,
        in_specs=[smem] * 6 + [s0],
        out_specs=(smem, sts),
        out_shape=(jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
                   jax.ShapeDtypeStruct((b, 3), jnp.float32)),
        scratch_shapes=[pltpu.SMEM((3,), jnp.float32)],
        interpret=_interpret(),
    )(*args, st0)
    return gains[:, 0, :], st


def _gate_xla(in_db, aa, ra, thr, rng, hs, env0, hold0, gain0):
    def step(carry, xs):
        env, hold, gain_db = carry
        in_db, thr, rng, aa, ra, hs = xs
        a = jnp.where(in_db > env, aa, ra)
        env = env + a * (in_db - env)
        is_open = env >= thr
        target = jnp.where(is_open | (hold > 0), 0.0, rng)
        hold = jnp.where(is_open, hs, jnp.maximum(hold - 1.0, 0.0))
        a2 = jnp.where(target > gain_db, aa, ra)
        gain_db = gain_db + a2 * (target - gain_db)
        return (env, hold, gain_db), gain_db

    (env, hold, gain_db), gains = jax.lax.scan(
        step, (env0, hold0, gain0), (in_db, thr, rng, aa, ra, hs), unroll=64)
    return (env, hold, gain_db), gains


def gate_machine(in_db, attack_a, release_a, threshold, range_db,
                 hold_samples, env0, hold0, gain0):
    """Full gate recurrence over one block; all streams [n] f32, state
    scalars.  Returns ((env, hold, gain_db), gains_db[n])."""
    n = in_db.shape[-1]
    use_pallas = (_on_tpu() and in_db.dtype == jnp.float32 and n >= _MIN_N
                  and n % _LANE == 0)
    if not use_pallas:
        return _gate_xla(in_db, attack_a, release_a, threshold, range_db,
                         hold_samples, env0, hold0, gain0)
    # 6 staged SMEM inputs: halve the chunk vs the 3-input follower
    tc = min(_chunk_for(n), 1024)
    st0 = jnp.stack([jnp.asarray(env0, jnp.float32),
                     jnp.asarray(hold0, jnp.float32),
                     jnp.asarray(gain0, jnp.float32)])[None, :]
    gains, st = _gate_call(
        in_db[None], attack_a[None], release_a[None], threshold[None],
        range_db[None], hold_samples[None], st0, tc)
    return (st[0, 0], st[0, 1], st[0, 2]), gains[0]
