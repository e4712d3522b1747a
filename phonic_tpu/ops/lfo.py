"""Low-frequency oscillator bank.

Behavioural spec: reference src/utils/dsp/lfo.rs.

All 7 waveforms (sine / triangle / ramp up / ramp down / square / random S&H
/ smooth random) are pure functions of the accumulated phase, so a block is
evaluated fully vectorised: phase[i] = phase0 + cumsum(inc), waveform applied
elementwise.  The fast sine approximation matches the reference bit-for-bit
in formula (src/utils/dsp/lfo.rs:7-19) — the reference deliberately uses it
instead of a true sine, so we must too for output parity.

Random waveforms: the reference draws from an OS-seeded SmallRng on every
phase wrap (src/utils/dsp/lfo.rs:242-252) and is therefore irreproducible
even against itself.  We define a deterministic spec instead: the value for
wrap index k is a counter-based hash of (seed, k), so renders are exactly
reproducible and statistically equivalent.  The waveform id is a traced
int32 — switching waveforms at runtime does not recompile.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

SINE = 0
TRIANGLE = 1
RAMP_UP = 2
RAMP_DOWN = 3
SQUARE = 4
RANDOM = 5
SMOOTH_RANDOM = 6

WAVEFORM_NAMES = (
    "Sine", "Triangle", "Ramp Up", "Ramp Down", "Square", "Random", "Smooth Random",
)

_PI = math.pi


def sine_approx(x):
    """Fast parabolic sine approximation for x in [-pi, pi]
    (reference: src/utils/dsp/lfo.rs:7-19)."""
    b = 4.0 / _PI
    c = -4.0 / (_PI * _PI)
    p = 0.225
    y = b * x + c * x * jnp.abs(x)
    return p * (y * jnp.abs(y) - y) + y


def _hash_random(seed, k):
    """Deterministic uniform [-1, 1) value for integer counter k — a cheap
    splitmix-style integer hash, good enough for LFO jitter."""
    x = (jnp.asarray(k, jnp.uint32) * jnp.uint32(0x9E3779B9)) ^ jnp.asarray(seed, jnp.uint32)
    x = (x ^ (x >> 16)) * jnp.uint32(0x85EBCA6B)
    x = (x ^ (x >> 13)) * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return (x.astype(jnp.float32) / jnp.float32(2**32)) * 2.0 - 1.0


class LfoState(NamedTuple):
    phase: jnp.ndarray  # f32 in [0, 1)
    wraps: jnp.ndarray  # int32 cumulative wrap count (random counter)


def lfo_init(phase: float = 0.0) -> LfoState:
    return LfoState(jnp.float32(phase), jnp.int32(0))


def lfo_block(
    state: LfoState,
    waveform,
    phase_inc,
    n: int,
    seed=0,
):
    """Render n LFO samples.  ``waveform`` is a traced int32 id; ``phase_inc``
    = rate/sample_rate, a scalar or per-sample array.  The value at sample i
    uses the phase *before* the i-th advance (reference run() order,
    src/utils/dsp/lfo.rs:122-170)."""
    inc = jnp.broadcast_to(jnp.asarray(phase_inc, jnp.float32), (n,))
    # exclusive cumsum: phase at sample i
    csum = jnp.cumsum(inc)
    raw_phase = state.phase + jnp.concatenate([jnp.zeros((1,), jnp.float32), csum[:-1]])
    phase = raw_phase - jnp.floor(raw_phase)
    wrap_idx = state.wraps + jnp.floor(raw_phase).astype(jnp.int32)

    tau = 2.0 * _PI
    p_sine = jnp.where(phase < 0.5, phase * tau, (phase - 1.0) * tau)
    sine = sine_approx(p_sine)
    triangle = jnp.where(
        phase < 0.25,
        phase * 4.0,
        jnp.where(phase < 0.75, 2.0 - phase * 4.0, phase * 4.0 - 4.0),
    )
    ramp_up = phase * 2.0 - 1.0
    ramp_down = 1.0 - phase * 2.0
    square = jnp.where(phase < 0.5, 1.0, -1.0)
    random = _hash_random(seed, wrap_idx)
    # smooth random: cosine-ish interpolation between consecutive wrap values
    # using the same sine approximation (src/utils/dsp/lfo.rs:151-156)
    t = (1.0 - sine_approx(_PI / 2.0 - phase * _PI)) * 0.5
    jit_cur = _hash_random(seed, wrap_idx)
    jit_tgt = _hash_random(seed, wrap_idx + 1)
    smooth = jit_cur + t * (jit_tgt - jit_cur)

    stacked = jnp.stack([sine, triangle, ramp_up, ramp_down, square, random, smooth])
    wf = jnp.clip(jnp.asarray(waveform, jnp.int32), 0, 6)
    out = jnp.take(stacked, wf, axis=0)

    end_raw = state.phase + csum[-1]
    new_state = LfoState(
        phase=end_raw - jnp.floor(end_raw),
        wraps=state.wraps + jnp.floor(end_raw).astype(jnp.int32),
    )
    return new_state, out
