"""Per-voice modulation matrix.

Behavioural spec: reference src/modulation/ — sources LFO1/LFO2 (bipolar,
rate 0.01-20 Hz + waveform), VELOCITY and KEYTRACK (unipolar, note/127)
(src/generator/sampler.rs:362-427); routing accumulates with polarity
transforms (src/modulation/matrix.rs:196-246): bipolar->unipolar maps
(v+1)/2, unipolar->bipolar maps (v-0.5)*2, matching polarities pass through;
each routing scales by its amount.

TPU formulation: routings live in a dense ``amounts[S, T]`` +
``bipolar[S, T]`` pair delivered as per-block inputs, so add/clear/update
modulation at runtime never recompiles.  LFO phases are analytic functions
of the note age (they restart at note-on), so the matrix carries no device
state; the reference computes sources in 64-sample chunks
(src/modulation/processor.rs:14), we compute them per sample.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops import lfo as lfo_ops

SOURCES = ("LFO1", "LFO2", "VELM", "KEYM")
SOURCE_BIPOLAR = (True, True, False, False)

# the 7 modulatable granular targets (src/generator/sampler/modulation.rs)
TARGETS = ("GSIZ", "GDEN", "GVAR", "GSPY", "GPAN", "GPOS", "GSTP")


class ModulationRoutings:
    """Host-side routing table -> dense device tensors."""

    def __init__(self):
        self.amounts = np.zeros((len(SOURCES), len(TARGETS)), np.float32)
        self.bipolar = np.zeros((len(SOURCES), len(TARGETS)), np.float32)

    def set(self, source: str, target: str, amount: float, bipolar: bool = True):
        s = SOURCES.index(source)
        t = TARGETS.index(target)
        self.amounts[s, t] = amount
        self.bipolar[s, t] = 1.0 if bipolar else 0.0

    def clear(self, source: str, target: str):
        s = SOURCES.index(source)
        t = TARGETS.index(target)
        self.amounts[s, t] = 0.0

    def clear_all(self):
        self.amounts[:] = 0.0


def source_values(age, velocity, note, lfo1_inc, lfo1_wf, lfo2_inc, lfo2_wf,
                  n: int, seed: int = 0):
    """[S, n] per-voice source values.  ``age`` int32[n] = runs since
    note-on (LFO phase = age * inc, restarting per note); velocity/note are
    scalars or [n] arrays."""
    agef = jnp.maximum(age.astype(jnp.float32), 0.0)

    def lfo(inc, wf, salt):
        raw = agef * inc
        phase = raw - jnp.floor(raw)
        wraps = jnp.floor(raw).astype(jnp.int32)
        return _waveform_at(wf, phase, wraps, seed + salt)

    l1 = lfo(lfo1_inc, lfo1_wf, 0x11)
    l2 = lfo(lfo2_inc, lfo2_wf, 0x22)
    vel = jnp.broadcast_to(jnp.asarray(velocity, jnp.float32), (n,))
    key = jnp.broadcast_to(jnp.asarray(note, jnp.float32) / 127.0, (n,))
    return jnp.stack([l1, l2, vel, key])


def _waveform_at(wf, phase, wraps, seed):
    """Evaluate an LFO waveform at explicit phases (shares the formulas of
    ops/lfo.lfo_block)."""
    import math

    tau = 2.0 * math.pi
    p_sine = jnp.where(phase < 0.5, phase * tau, (phase - 1.0) * tau)
    sine = lfo_ops.sine_approx(p_sine)
    triangle = jnp.where(
        phase < 0.25, phase * 4.0,
        jnp.where(phase < 0.75, 2.0 - phase * 4.0, phase * 4.0 - 4.0),
    )
    ramp_up = phase * 2.0 - 1.0
    ramp_down = 1.0 - phase * 2.0
    square = jnp.where(phase < 0.5, 1.0, -1.0)
    random = lfo_ops._hash_random(seed, wraps)
    t = (1.0 - lfo_ops.sine_approx(math.pi / 2.0 - phase * math.pi)) * 0.5
    smooth = random + t * (lfo_ops._hash_random(seed, wraps + 1) - random)
    stacked = jnp.stack([sine, triangle, ramp_up, ramp_down, square, random, smooth])
    return jnp.take(stacked, jnp.clip(jnp.asarray(wf, jnp.int32), 0, 6), axis=0)


def apply_matrix(sources, amounts, bipolar):
    """sources [S, n] -> target offsets [T, n] with polarity transforms."""
    src_bip = jnp.asarray(SOURCE_BIPOLAR, jnp.float32)[:, None, None]  # [S,1,1]
    s = sources[:, None, :]  # [S, 1, n]
    tgt_bip = jnp.asarray(bipolar, jnp.float32)[:, :, None]  # [S, T, 1]
    # four polarity cases (matrix.rs:196-246)
    as_is = s
    bi_to_uni = (s + 1.0) * 0.5
    uni_to_bi = (s - 0.5) * 2.0
    v = jnp.where(
        src_bip > 0.5,
        jnp.where(tgt_bip > 0.5, as_is, bi_to_uni),
        jnp.where(tgt_bip > 0.5, uni_to_bi, as_is),
    )
    return jnp.sum(v * jnp.asarray(amounts, jnp.float32)[:, :, None], axis=0)  # [T, n]
