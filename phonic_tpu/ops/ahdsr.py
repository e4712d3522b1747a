"""AHDSR envelope, evaluated in closed form.

Behavioural spec: reference src/utils/ahdsr.rs (stage machine :442-556,
rates :160-265, curve scaling :325-346).

The reference advances a per-voice stage machine one sample at a time with
fixed per-stage linear rates.  Because every stage is a linear ramp with a
precomputable duration, the envelope value at any sample index is a closed-
form function of (runs since note-on, runs since note-off, velocity volume)
— so a whole block of envelope values for a whole bank of voices evaluates
as pure elementwise math, no scan at all.

Reference quirks reproduced deliberately:
  * release ends by snapping to 0 once the value falls below 0.001 (-60 dB)
    (src/utils/ahdsr.rs:506-510);
  * release duration is level-independent: the decrement is
    ``release_level * release_rate`` (src/utils/ahdsr.rs:504);
  * "release scaling" is a no-op in the reference (progress always computes
    to 0 at src/utils/ahdsr.rs:545-552), so it is a no-op here.

Deliberate deviations:
  * values are exact closed forms, not f32 accumulation (the reference's
    repeated ``output += rate`` drifts by ~1e-4 relative over a 1 s stage);
  * decay curve scaling always treats the level decay started from as the
    curve anchor; the reference's post-attack decay scaling reads a stale
    ``target_volume`` and produces NaN-prone out-of-range progress
    (src/utils/ahdsr.rs:520-536) — not worth reproducing.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

SILENCE = 0.001  # -60 dB release cutoff (src/utils/ahdsr.rs:377)
_E_DIV_2 = math.e / 2.0


class AhdsrParams(NamedTuple):
    """Precomputed per-sample rates (reference: src/utils/ahdsr.rs:160-265).
    Fields may be scalars or arrays batched over voices."""

    attack_rate: jnp.ndarray  # volume units / sample; inf = skip attack
    hold_samples: jnp.ndarray  # float samples
    decay_rate: jnp.ndarray  # (1 - sustain) / decay-samples; inf = skip
    sustain: jnp.ndarray  # 0..1
    release_rate: jnp.ndarray  # 1 / release-samples; inf = cut
    attack_scaling: jnp.ndarray  # -1..1, 0 = linear
    decay_scaling: jnp.ndarray


def ahdsr_params(
    sample_rate: int,
    attack_secs,
    hold_secs,
    decay_secs,
    sustain_level,
    release_secs,
    attack_scaling=0.0,
    decay_scaling=0.0,
) -> AhdsrParams:
    attack_secs = jnp.asarray(attack_secs, jnp.float32)
    hold_secs = jnp.asarray(hold_secs, jnp.float32)
    decay_secs = jnp.asarray(decay_secs, jnp.float32)
    sustain_level = jnp.asarray(sustain_level, jnp.float32)
    release_secs = jnp.asarray(release_secs, jnp.float32)
    sr = float(sample_rate)
    inf = jnp.float32(jnp.inf)
    return AhdsrParams(
        attack_rate=jnp.where(attack_secs > 0.0, 1.0 / jnp.maximum(attack_secs * sr, 1e-9), inf),
        hold_samples=hold_secs * sr,
        decay_rate=jnp.where(
            decay_secs > 0.0,
            (1.0 - sustain_level) / jnp.maximum(decay_secs * sr, 1e-9),
            inf,
        ),
        sustain=sustain_level,
        release_rate=jnp.where(release_secs > 0.0, 1.0 / jnp.maximum(release_secs * sr, 1e-9), inf),
        attack_scaling=jnp.asarray(attack_scaling, jnp.float32),
        decay_scaling=jnp.asarray(decay_scaling, jnp.float32),
    )


def apply_scaling(value, scaling):
    """Curve shaping x -> x^(1 + s^(e/2)*16) (positive scaling: fast start /
    logarithmic; negative: slow start / exponential)
    (reference: src/utils/ahdsr.rs:325-346)."""
    s = -jnp.asarray(scaling, jnp.float32)
    value = jnp.asarray(value, jnp.float32)
    mag = jnp.abs(s)
    exponent = 1.0 + jnp.power(jnp.maximum(mag, 1e-9), _E_DIV_2) * 16.0
    pos = jnp.power(jnp.maximum(value, 0.0), exponent)
    neg = 1.0 - jnp.power(jnp.maximum(1.0 - value, 0.0), exponent)
    shaped = jnp.where(s > 0.0, pos, neg)
    return jnp.where((s == 0.0) | (value == 0.0), value, shaped)


def _raw_value(p: AhdsrParams, volume, c):
    """Pre-scaling envelope after ``c`` runs since note-on (c >= 1), while the
    note is held.  Also returns the stage id (0 attack / 1 hold / 2 decay /
    3 sustain) *after* run c — scaling selects on the post-run stage."""
    volume = jnp.asarray(volume, jnp.float32)
    c = jnp.asarray(c, jnp.float32)

    skip_attack = jnp.isinf(p.attack_rate)
    n_attack = jnp.where(
        skip_attack, 0.0, jnp.ceil(volume / jnp.where(skip_attack, 1.0, p.attack_rate))
    )
    n_hold = jnp.ceil(p.hold_samples)
    skip_decay = jnp.isinf(p.decay_rate)
    # Reference quirk (src/utils/ahdsr.rs:470-478): with a zero decay time the
    # hold stage transitions straight to Sustain *without touching output*, so
    # the envelope sustains at the attack peak; only the hold==0 path reaches
    # the Decay stage and clamps to the sustain level in one run.
    sustain_level = jnp.where(skip_decay & (n_hold > 0), volume, p.sustain)
    dist = jnp.abs(volume - sustain_level)
    n_decay = jnp.where(
        skip_decay, jnp.where(dist > 0.0, 1.0, 0.0),
        jnp.ceil(dist / jnp.where(skip_decay, 1.0, p.decay_rate)),
    )

    attack_val = jnp.minimum(c * p.attack_rate, volume)
    c_decay = c - n_attack - n_hold
    toward = jnp.where(volume > sustain_level, -1.0, 1.0)
    decay_val = volume + toward * c_decay * jnp.where(skip_decay, dist, p.decay_rate)
    decay_val = jnp.where(
        volume > sustain_level,
        jnp.maximum(decay_val, sustain_level),
        jnp.minimum(decay_val, sustain_level),
    )

    in_attack = c <= n_attack
    in_hold = (~in_attack) & (c <= n_attack + n_hold)
    in_decay = (~in_attack) & (~in_hold) & (c_decay <= n_decay)

    raw = jnp.where(
        in_attack,
        attack_val,
        jnp.where(in_hold, volume, jnp.where(in_decay, decay_val, sustain_level)),
    )
    # post-run stage: attack's final run already switched to hold/decay
    stage = jnp.where(
        c < n_attack, 0, jnp.where(in_hold | (in_attack & (n_hold > 0)), 1, jnp.where(in_decay, 2, 3))
    )
    return raw, stage


def _display_value(p: AhdsrParams, volume, c):
    """Post-scaling envelope value after ``c`` held runs."""
    raw, stage = _raw_value(p, volume, c)
    vol = jnp.maximum(jnp.asarray(volume, jnp.float32), jnp.finfo(jnp.float32).eps)
    # attack scaling (src/utils/ahdsr.rs:515-519)
    att = apply_scaling(raw / vol, p.attack_scaling) * vol
    # decay scaling, anchored at the decay start level (see module docstring)
    rng = jnp.maximum(jnp.abs(vol - p.sustain), jnp.finfo(jnp.float32).eps)
    prog = jnp.abs(vol - raw) / rng
    dec = jnp.where(
        vol > p.sustain,
        vol - apply_scaling(prog, p.decay_scaling) * rng,
        vol + apply_scaling(prog, p.decay_scaling) * rng,
    )
    out = jnp.where(stage == 0, att, jnp.where(stage == 2, dec, raw))
    return out, raw


def ahdsr_block(
    p: AhdsrParams,
    volume,
    note_age0,
    release_at,
    n: int,
):
    """Envelope values for one block.

    volume:     velocity volume at note-on.
    note_age0:  runs completed before this block (int; <0 = note not started;
                sample i of the block is run ``note_age0 + i + 1``).
    release_at: run count after which note-off occurred (inf = held).
    Returns values[n] (float32).  Vectorise over voices with vmap.
    """
    i = jnp.arange(n, dtype=jnp.float32)
    c = jnp.asarray(note_age0, jnp.float32) + i + 1.0
    started = c >= 1.0

    release_at = jnp.asarray(release_at, jnp.float32)
    held_val, _ = _display_value(p, volume, jnp.maximum(c, 1.0))

    # value the release decays from: the (raw == display, release scaling is
    # a no-op) envelope at the note-off run
    rel_level, _ = _display_value(p, volume, jnp.maximum(release_at, 1.0))
    rel_level = jnp.where(release_at < 1.0, 0.0, rel_level)
    r = c - release_at
    cut = jnp.isinf(p.release_rate)
    rel_val = rel_level * (1.0 - r * jnp.where(cut, 1.0, p.release_rate))
    rel_val = jnp.where(cut | (rel_val <= SILENCE), 0.0, rel_val)
    # note_off with an already-silent envelope goes straight to idle
    rel_val = jnp.where(rel_level <= jnp.finfo(jnp.float32).eps, 0.0, rel_val)

    released = r > 0.0
    out = jnp.where(released, rel_val, jnp.where(started, held_val, 0.0))
    return out.astype(jnp.float32)


def ahdsr_values(p: AhdsrParams, volume, ages, release_at):
    """Envelope values at explicit per-sample ages (int32[n], runs since
    note-on minus one) with a scalar-or-[n] release_at.  Used by synth voices
    whose lane-mixed ages are not contiguous."""
    c = jnp.asarray(ages, jnp.float32) + 1.0
    started = c >= 1.0
    release_at = jnp.asarray(release_at, jnp.float32)
    held_val, _ = _display_value(p, volume, jnp.maximum(c, 1.0))
    rel_level, _ = _display_value(p, volume, jnp.maximum(release_at, 1.0))
    rel_level = jnp.where(release_at < 1.0, 0.0, rel_level)
    r = c - release_at
    cut = jnp.isinf(p.release_rate)
    rel_val = rel_level * (1.0 - r * jnp.where(cut, 1.0, p.release_rate))
    rel_val = jnp.where(cut | (rel_val <= SILENCE), 0.0, rel_val)
    rel_val = jnp.where(rel_level <= jnp.finfo(jnp.float32).eps, 0.0, rel_val)
    out = jnp.where(r > 0.0, rel_val, jnp.where(started, held_val, 0.0))
    return out.astype(jnp.float32)


def ahdsr_release_duration(p: AhdsrParams) -> jnp.ndarray:
    """Runs until the release hits the -60 dB cutoff from full level —
    used by voice allocators to retire voices."""
    return jnp.where(
        jnp.isinf(p.release_rate), 0.0, jnp.ceil((1.0 - SILENCE) / p.release_rate)
    )
