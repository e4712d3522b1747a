"""Musical unit conversions (dB, panning, MIDI note pitch).

Behavioural spec: reference src/utils.rs:20-80.  All functions are pure
``jnp`` ops usable inside jit; NumPy twins live in tests/reference_dsp.py.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..config import MINUS_INF_DB

_LIN_TO_DB = 20.0 / math.log(10.0)
_DB_TO_LIN = math.log(10.0) / 20.0
_SQRT2 = math.sqrt(2.0)


def linear_to_db(value):
    """Linear gain factor -> dB.  Values <= 1e-12 map to -200 dB; exactly 1.0
    maps to exactly 0 dB (reference: src/utils.rs:25-36)."""
    value = jnp.asarray(value, jnp.float32)
    db = jnp.log(jnp.maximum(value, 1e-30)) * _LIN_TO_DB
    db = jnp.where(value > 1e-12, db, MINUS_INF_DB)
    db = jnp.where(value == 1.0, 0.0, db)
    return jnp.where(value < 0.0, jnp.nan, db)


def db_to_linear(value):
    """dB -> linear gain factor.  <= -200 dB maps to 0; exactly 0 dB maps to
    exactly 1.0 (reference: src/utils.rs:40-51)."""
    value = jnp.asarray(value, jnp.float32)
    lin = jnp.exp(value * _DB_TO_LIN)
    lin = jnp.where(value > MINUS_INF_DB, lin, 0.0)
    return jnp.where(value == 0.0, 1.0, lin)


def panning_factors(pan):
    """[-1, 1] pan position -> constant-power (left, right) gains, normalised
    so that centre pan gives unity (reference: src/utils.rs:55-63)."""
    pan = jnp.clip(jnp.asarray(pan, jnp.float32), -1.0, 1.0)
    normalized = (pan + 1.0) * 0.5
    left = jnp.sqrt(1.0 - normalized) * _SQRT2
    right = jnp.sqrt(normalized) * _SQRT2
    return left, right


def pitch_from_note(midi_note):
    """MIDI note -> Hz, equal temperament, A4 (note 69) = 440 Hz
    (reference: src/utils.rs:75-79)."""
    note = jnp.asarray(midi_note, jnp.float32)
    return 440.0 * jnp.exp2((note - 69.0) / 12.0)


def speed_from_note(midi_note):
    """MIDI note -> playback speed relative to middle C (note 60)
    (reference: src/utils.rs:67-71)."""
    note = jnp.asarray(midi_note, jnp.float32)
    return jnp.exp2((note - 60.0) / 12.0)
