"""Auto-bypass path equivalence (VERDICT r1 weak #6): for non-silent audio
the auto_bypass=True (Player) path and the auto_bypass=False (batched /
offline) path must produce the same output — bypass may only ever engage
(and freeze mod phases) during genuine silence beyond the worst-case tail.

The two configs compile DIFFERENT XLA programs (lax.cond changes fusion and
op scheduling), so equality is asserted at float32 rounding level (-100 dB)
rather than bitwise."""

import dataclasses

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from phonic_tpu import (AudioFileBuffer, EngineConfig, FilePlaybackOptions,
                        FileSource, Mixer, RenderProgram)
from phonic_tpu.effects.chorus import ChorusEffect
from phonic_tpu.effects.delay import DelayEffect
from phonic_tpu.effects.filter import FilterEffect

SR = 48000


def _graph(frames):
    t = np.arange(frames) / SR
    tone = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    buf = AudioFileBuffer.from_array(tone[None, :], SR)
    m = Mixer("main")
    m.add_source(FileSource(buf, FilePlaybackOptions(volume=0.8,
                                                     fade_out_secs=0.0)))
    m.add_effect(FilterEffect(cutoff=3000.0))
    m.add_effect(DelayEffect(delay_ms=120.0, feedback=0.3, wet=0.4))
    m.add_effect(ChorusEffect(rate=1.0, depth=0.3, wet=0.4))
    return m


def test_bypass_identical_for_nonsilent_audio():
    frames = SR  # source plays the whole render: never silent
    outs = {}
    for bypass in (False, True):
        cfg = EngineConfig(sample_rate=SR, block_frames=4096,
                           auto_bypass=bypass)
        prog = RenderProgram(_graph(frames), cfg)
        outs[bypass] = prog.render(duration_frames=frames, mode="loop")
    _assert_equivalent(outs[True], outs[False])


def _assert_equivalent(a, b):
    peak = max(float(np.abs(b).max()), 1e-9)
    err = float(np.abs(a - b).max()) / peak
    err_db = 20 * np.log10(max(err, 1e-12))
    assert err_db < -100.0, f"paths diverged: {err_db:.1f} dB"


def test_bypass_engages_only_after_worst_case_tail():
    """A short tone followed by long silence: outputs stay identical until
    well past max_tail_frames + 2 s — i.e. bypass never cuts a ringing
    tail, even though the construction-time tail estimate is shorter."""
    tone_frames = SR // 4
    render_frames = 2 * SR
    outs = {}
    for bypass in (False, True):
        cfg = EngineConfig(sample_rate=SR, block_frames=4096,
                           auto_bypass=bypass)
        prog = RenderProgram(_graph(tone_frames), cfg)
        outs[bypass] = prog.render(duration_frames=render_frames, mode="loop")
    # identical for the whole render here: the delay/chorus worst-case tail
    # (10 s) plus the 2 s silence window exceeds the render length, so
    # bypass never engages
    _assert_equivalent(outs[True], outs[False])
    # and the tail is actually ringing after the tone stops (the test would
    # be vacuous on silence)
    assert np.abs(outs[False][:, tone_frames + SR // 2 :]).max() > 1e-5


def test_batched_chains_freeze_parked_lanes():
    """Sibling-mixer chains batched under auto_bypass (round 3): a lane
    whose source starts LATE must keep its effect state frozen while its
    input is silent — exactly like the unbatched per-effect cond — so
    batched and unbatched renders agree even with staggered lane starts.
    (Regression: a group-level-only cond let the silent lane's chorus LFO
    advance, shifting its phase by the startup delay.)"""
    frames = SR
    outs = {}
    for batch in (False, True):
        m = Mixer("main")
        t = np.arange(SR // 2) / SR
        for k, start in enumerate((0, 26575)):
            sub = m.add_mixer()
            tone = (0.4 * np.sin(2 * np.pi * 220 * (k + 1) * t)).astype(
                np.float32)
            buf = AudioFileBuffer.from_array(tone[None, :], SR)
            sub.add_source(FileSource(buf, FilePlaybackOptions(
                volume=0.5, start_time=start, fade_out_secs=0.0)))
            sub.add_effect(ChorusEffect(rate=0.5 + k, depth=0.3, wet=0.4))
            sub.add_effect(DelayEffect(delay_ms=80.0 + 20 * k, feedback=0.3,
                                       wet=0.4))
        cfg = EngineConfig(sample_rate=SR, block_frames=8192,
                           auto_bypass=True, batch_effects=batch)
        prog = RenderProgram(m, cfg)
        if batch:
            assert prog.effect_batches, "chains were not batched"
        outs[batch] = prog.render(duration_frames=frames, mode="loop")
    _assert_equivalent(outs[True], outs[False])
