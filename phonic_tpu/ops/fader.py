"""Volume fader for de-clicked starts/stops.

Behavioural spec: reference src/utils/fader.rs — an exponential per-frame
ramp toward a target volume with inertia chosen so the fade reaches 99 % of
the target in the configured duration:

    inertia = 1 - exp(-ln(100) / (sr * duration))
    v += (target - v) * inertia        (once per frame)

state: 0 = stopped (bypass, gain 1), 1 = running, 2 = finished (gain ==
target).  The reference flips running->finished when |v - target| < 1e-4,
checked once per processed block (src/utils/fader.rs:118-121); we apply the
check per frame analytically — the output difference is bounded by 1e-4
(-80 dB) on already-faded material and removes the reference's block-size
dependence.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

STOPPED = 0
RUNNING = 1
FINISHED = 2

_LN100 = math.log(100.0)
_DONE_EPS = 1e-4


class FaderState(NamedTuple):
    mode: jnp.ndarray  # int32
    current: jnp.ndarray  # f32
    target: jnp.ndarray  # f32
    inertia: jnp.ndarray  # f32


def fader_init() -> FaderState:
    return FaderState(jnp.int32(STOPPED), jnp.float32(1.0), jnp.float32(1.0), jnp.float32(1.0))


def fader_inertia(duration_secs, sample_rate: int):
    d = jnp.asarray(duration_secs, jnp.float32)
    samples = float(sample_rate) * d / _LN100
    return jnp.where(d > 0.0, 1.0 - jnp.exp(-1.0 / jnp.maximum(samples, 1e-9)), 1.0)


def fader_start(state: FaderState, from_v, to_v, duration_secs, sample_rate: int) -> FaderState:
    """start(from, to, duration) (reference: src/utils/fader.rs:76-93).
    Zero duration jumps straight to finished."""
    d = jnp.asarray(duration_secs, jnp.float32)
    running = d > 0.0
    return FaderState(
        mode=jnp.where(running, RUNNING, FINISHED).astype(jnp.int32),
        current=jnp.asarray(from_v, jnp.float32),
        target=jnp.asarray(to_v, jnp.float32),
        inertia=fader_inertia(d, sample_rate),
    )


def fader_block(state: FaderState, n: int):
    """Per-frame gains for one block.  Returns (new_state, gains[n])."""
    j = jnp.arange(1, n + 1, dtype=jnp.float32)
    decay = jnp.exp(jnp.log1p(-jnp.minimum(state.inertia, 1.0 - 1e-9)) * j)
    ramp = state.target + (state.current - state.target) * decay
    done = jnp.abs(ramp - state.target) < _DONE_EPS
    running = state.mode == RUNNING
    gains = jnp.where(
        running,
        jnp.where(done, state.target, ramp),
        jnp.where(state.mode == FINISHED, state.target, 1.0),
    )
    end_cur = jnp.where(running & ~done[-1], ramp[-1], state.target)
    new_mode = jnp.where(running & done[-1], FINISHED, state.mode).astype(jnp.int32)
    return FaderState(new_mode, end_cur, state.target, state.inertia), gains
