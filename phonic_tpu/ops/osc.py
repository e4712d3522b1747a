"""Oscillator building blocks for synth definitions.

The reference builds synth voices from FunDSP graph nodes
(src/source/synth/fundsp.rs, src/utils/fundsp/multi_osc.rs); here the
equivalents are pure phase-domain functions: a carried phase accumulates
per-sample frequency, waveshapes are evaluated analytically, and polyBLEP
corrections suppress aliasing on the discontinuous shapes.
"""

from __future__ import annotations

import jax.numpy as jnp


def phase_accumulate(phase0, freq, sr: int):
    """phase[n] in [0,1) from a carried phase and per-sample Hz.
    Returns (phase[n], end_phase)."""
    inc = jnp.asarray(freq, jnp.float32) / sr
    csum = jnp.cumsum(inc)
    raw = phase0 + jnp.concatenate([jnp.zeros((1,), jnp.float32), csum[:-1]])
    end = phase0 + csum[-1]
    return raw - jnp.floor(raw), end - jnp.floor(end)


def _polyblep(t, dt):
    """2-sample polyBLEP residual at a discontinuity."""
    dt = jnp.maximum(dt, 1e-9)
    a = t / dt
    b = (t - 1.0) / dt + 1.0
    up = 2.0 * a - a * a - 1.0  # t < dt
    down = b * b + 2.0 * b + 1.0  # t > 1 - dt
    return jnp.where(t < dt, up, jnp.where(t > 1.0 - dt, down, 0.0))


def sine(phase):
    return jnp.sin(2.0 * jnp.pi * phase)


def saw(phase, freq=None, sr: int = 48000):
    """Rising saw in [-1, 1]; pass freq for polyBLEP anti-aliasing."""
    naive = 2.0 * phase - 1.0
    if freq is None:
        return naive
    return naive - _polyblep(phase, jnp.asarray(freq, jnp.float32) / sr)


def square(phase, freq=None, sr: int = 48000, duty=0.5):
    naive = jnp.where(phase < duty, 1.0, -1.0)
    if freq is None:
        return naive
    dt = jnp.asarray(freq, jnp.float32) / sr
    t2 = jnp.mod(phase - duty, 1.0)
    return naive + _polyblep(phase, dt) - _polyblep(t2, dt)


def triangle(phase):
    return jnp.where(phase < 0.25, phase * 4.0,
                     jnp.where(phase < 0.75, 2.0 - phase * 4.0, phase * 4.0 - 4.0))


def morph_osc(phase, shape, freq=None, sr: int = 48000):
    """Morphing oscillator (reference: src/utils/fundsp/multi_osc.rs) —
    shape 0..3 crossfades sine -> triangle -> saw -> square."""
    shape = jnp.clip(jnp.asarray(shape, jnp.float32), 0.0, 3.0)
    waves = jnp.stack([
        sine(phase), triangle(phase), saw(phase, freq, sr), square(phase, freq, sr),
    ])
    lo = jnp.clip(shape.astype(jnp.int32), 0, 2)
    frac = shape - lo
    # shape may be a per-sample array (runtime-automated morph): select the
    # two neighbour waves per sample
    lo_b = jnp.broadcast_to(lo, waves.shape[1:])
    wlo = jnp.take_along_axis(waves, lo_b[None], axis=0)[0]
    whi = jnp.take_along_axis(waves, (lo_b + 1)[None], axis=0)[0]
    return wlo * (1.0 - frac) + whi * frac
