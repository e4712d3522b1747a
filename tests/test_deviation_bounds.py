"""Quantify the two documented deviations from the reference (VERDICT r1
item 10) against per-sample oracles, with explicit bounds:

1. granular playhead loop-entry latch: the engine folds the UNWRAPPED raw
   playhead accumulation once the loop is entered
   (generators/granular.py:174-190), while the reference advances a wrapped
   per-sample state machine (granular.rs:605-640).  Exact when the playhead
   reaches the loop without a global wrap; bounded when it wraps first.
2. sampler AHDSR reshaping mid-note: the engine re-evaluates the closed
   form with the new parameters at the current age (sampler.py:14-23); the
   reference mutates stage rates mid-trajectory (ahdsr.rs:448-552).  The
   deviation is a one-time level step at the change, converging at sustain.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from phonic_tpu import (AudioFileBuffer, EngineConfig, Mixer, RenderProgram,
                        Sampler)
from phonic_tpu.generators.sampler import AhdsrConfig

import reference_dsp as ref

SR = 48000


# ---------------------------------------------------------------------------
# 1. granular loop-entry latch
# ---------------------------------------------------------------------------

def _oracle_playhead(ph0, inc, n, ls, le):
    """Per-sample reference state machine (granular.rs:605-640)."""
    ph = ph0
    latched = False
    out = np.empty(n, np.float64)
    ll = le - ls
    for i in range(n):
        ph += inc
        if latched:
            ph = ls + (ph - ls) % ll
        elif ls <= ph < le:
            latched = True
        else:
            if ph >= 1.0:
                ph -= 1.0
            elif ph < 0.0:
                ph += 1.0
        out[i] = ph
    return out


def _engine_playhead(ph0, inc, n, ls, le):
    """The engine's ACTUAL block formula (granular.playhead_trajectory),
    evaluated in f64 via numpy equivalence is no longer needed — call the
    real jax function (blocks of 2048 with state carry, as the engine
    runs it)."""
    import jax.numpy as jnp
    from phonic_tpu.generators.granular import playhead_trajectory
    out = np.empty(n, np.float64)
    ph, in_loop = np.float32(ph0), 0.0
    block = 2048
    for t0 in range(0, n, block):
        cn = min(block, n - t0)
        steps = jnp.full((cn,), np.float32(inc))
        ph_b, entered = playhead_trajectory(
            jnp.float32(ph), jnp.float32(in_loop), steps,
            (jnp.float32(1.0), jnp.float32(ls), jnp.float32(le)))
        out[t0:t0 + cn] = np.asarray(ph_b, np.float64)
        ph = float(np.asarray(ph_b)[-1])
        in_loop = float(np.asarray(entered)[-1])
    return out


def test_loop_latch_exact_without_global_wrap():
    """Entering the loop mid-block before any global wrap (the entry here
    lands at sample ~3600, inside the second 2048 block): the engine's
    real blockwise trajectory matches the per-sample oracle to f32
    accumulation error — the latch itself introduces NO deviation in this
    regime (a latch error would be O(loop_len) = 0.2)."""
    ls, le = 0.4, 0.6
    inc = 1.0 / 9000.0  # ~0.9 s to cross into the loop at 48 kHz
    got = _engine_playhead(0.0, inc, 30000, ls, le)
    want = _oracle_playhead(0.0, inc, 30000, ls, le)
    # circular metric within the loop: a fold boundary sample may read
    # ls vs le-eps, which is the same loop phase
    ll = le - ls
    dev = np.abs(got - want)
    dev = np.minimum(dev, ll - dev)
    assert dev.max() < 1e-3, dev.max()


def test_loop_latch_bounded_after_global_wrap():
    """Starting past the loop, the playhead wraps globally at 1.0 before
    entering.  The engine folds the unwrapped accumulation, so once latched
    its phase within the loop can differ from the oracle's by a constant
    offset bounded by mod(global_wraps, loop_len) — it never drifts, and
    both stay inside the loop."""
    ls, le = 0.3, 0.5
    ll = le - ls
    inc = 1.0 / 5000.0
    n = 30000
    got = _engine_playhead(0.7, inc, n, ls, le)
    want = _oracle_playhead(0.7, inc, n, ls, le)
    # both latch and remain inside [ls, le)
    assert np.all((got[-5000:] >= ls) & (got[-5000:] < le))
    assert np.all((want[-5000:] >= ls) & (want[-5000:] < le))
    # deviation is a CONSTANT phase offset after both latch (no drift
    # beyond f32 accumulation noise)
    tail = (got - want)[-5000:]
    offsets = np.mod(tail, ll)
    assert (offsets.max() - offsets.min()) < 2e-3, "latch offset drifts"
    # and the offset is the predicted mod of the skipped global wrap
    assert np.abs(tail).max() <= ll + 1e-3


# ---------------------------------------------------------------------------
# 2. AHDSR reshaping mid-note
# ---------------------------------------------------------------------------

def _render_envelope(decay_change_at=None, new_decay=None, length=SR // 2):
    """Render a unity-DC buffer through a Sampler so the output IS the
    envelope, optionally rescheduling ENV_DECAY mid-note."""
    frames = 2 * SR + SR // 2
    buf = AudioFileBuffer.from_array(np.ones((1, frames), np.float32), SR)
    s = Sampler(buf, envelope=AhdsrConfig(attack=0.01, hold=0.0, decay=0.5,
                                          sustain=0.3, release=0.1))
    s.note_on(60, volume=1.0, time=0)
    m = Mixer("main")
    m.add_source(s)
    prog = RenderProgram(m, EngineConfig(sample_rate=SR, block_frames=2048))
    if decay_change_at is not None:
        prog.set_parameter(s, "ADCY", new_decay, at_frame=decay_change_at)
    out = prog.render(duration_frames=length)
    # pan factors are unity at center, so channel 0 IS the envelope
    return out[0]


def test_ahdsr_reshape_deviation_bounded_and_converging():
    change_at = 8192          # mid-decay (attack 0.01 s = 480 frames)
    new_decay = 1.5
    length = 2 * SR           # long enough for both paths to hit sustain

    got = _render_envelope(change_at, new_decay, length=length)

    # reference oracle: mutate the decay rate mid-trajectory
    env = ref.Ahdsr(SR, attack=0.01, hold=0.0, decay=0.5, sustain=0.3,
                    release=0.1)
    env.note_on(1.0)
    want = np.empty(length, np.float32)
    for i in range(length):
        if i == change_at:
            env.decay_time = new_decay
            env.decay_rate = np.float32((1.0 - 0.3) / (new_decay * SR))
        want[i] = env.run()

    dev = np.abs(got - want)
    # before the change: closed form == oracle (float accumulation error)
    assert dev[:change_at].max() < 2e-3, dev[:change_at].max()
    # the deviation introduced at the change is a one-time level step: it
    # cannot exceed the closed-form re-evaluation jump at the change age
    env_old_at = want[change_at - 1]
    # closed-form with NEW params at the change age
    c = change_at / SR
    attack_end = 0.01
    new_env_at = 1.0 - (c - attack_end) * (1.0 - 0.3) / new_decay
    jump = abs(new_env_at - env_old_at)
    assert dev[change_at:].max() <= jump + 2e-3, \
        (dev[change_at:].max(), jump)
    # both converge to sustain: deviation vanishes at the decay tails
    assert dev[-2000:].max() < 5e-3, dev[-2000:].max()


def test_ahdsr_no_change_matches_oracle():
    got = _render_envelope()
    env = ref.Ahdsr(SR, attack=0.01, hold=0.0, decay=0.5, sustain=0.3,
                    release=0.1)
    env.note_on(1.0)
    want = np.array([env.run() for _ in range(SR // 2)], np.float32)
    assert np.abs(got - want).max() < 2e-3


# ---------------------------------------------------------------------------
# 3. double steal of one voice within a block (sampler.py module docstring)
# ---------------------------------------------------------------------------

def test_double_steal_per_block_keeps_last_note():
    """Documented deviation: when one voice is stolen TWICE inside a single
    block, only the LAST trigger renders (the middle note vanishes and the
    continuing note holds until the last trigger, not the first).  Pin that
    exact semantic: 3 notes on 1 voice in one 2048 block must render
    identically to the 2-note schedule (first note cut at the LAST
    trigger's time, middle note absent)."""
    from phonic_tpu.generators.base import GeneratorPlaybackOptions
    def prog_with_v1(notes):
        buf = AudioFileBuffer.from_array(
            (0.5 * np.sin(2 * np.pi * 330 *
                          np.arange(24000) / SR)).astype(np.float32)[None],
            SR)
        s = Sampler(buf, GeneratorPlaybackOptions(voices=1),
                    envelope=AhdsrConfig(attack=0.001, release=0.02))
        for note, t in notes:
            s.note_on(note, volume=0.8, time=t)
        m = Mixer("main")
        m.add_source(s)
        return RenderProgram(m, EngineConfig(sample_rate=SR,
                                             block_frames=2048))

    # triple schedule: t=0, t=500 (vanishes), t=1200 (kept)
    a = prog_with_v1([(60, 0), (64, 500), (67, 1200)]).render(
        duration_frames=4096)
    # documented equivalent: first note runs to the LAST trigger, last note
    # from there; the middle note never sounds
    b = prog_with_v1([(60, 0), (67, 1200)]).render(duration_frames=4096)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
