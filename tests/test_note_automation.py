"""Per-note automation: set_note_volume / set_note_panning / set_note_speed
(reference: GeneratorPlaybackEvent::{SetVolume,SetPanning,SetSpeed} applied in
sampler voices, src/generator/sampler/voice.rs:238-300, scheduled through
GeneratorPlaybackHandle, src/player/handles/generator.rs:258-329)."""

import numpy as np
import pytest

from phonic_tpu import AudioFileBuffer, EngineConfig, Mixer, RenderProgram
from phonic_tpu.generators.sampler import Sampler

from test_glide import reference_glide

SR = 48000
N = 2048
CFG = EngineConfig(sample_rate=SR, channels=2, block_frames=N,
                   max_events_per_block=8)


def dc_buffer(frames=SR):
    return AudioFileBuffer.from_array(np.ones((1, frames), np.float32), SR)


def ramp_buffer(frames):
    return AudioFileBuffer.from_array(
        (np.arange(frames, dtype=np.float32) / SR)[None, :], SR)


def render(sampler, frames):
    main = Mixer("main")
    main.add_source(sampler)
    prog = RenderProgram(main, CFG)
    return np.asarray(prog.render(duration_frames=frames))


def test_set_note_volume_is_sample_accurate():
    s = Sampler(dc_buffer())  # no envelope: raw one-shot
    nid = s.note_on(60, volume=1.0, time=0)
    s.set_note_volume(nid, 0.25, time=700)
    out = render(s, N)
    left = out[0]
    assert left[699] == pytest.approx(left[0])
    assert left[700] == pytest.approx(left[0] * 0.25, rel=1e-5)
    assert left[-1] == pytest.approx(left[0] * 0.25, rel=1e-5)


def test_set_note_volume_on_triggered_lane_same_block():
    s = Sampler(dc_buffer())
    nid = s.note_on(60, volume=0.8, time=100)
    s.set_note_volume(nid, 0.4, time=300)
    out = render(s, N)
    left = out[0]
    assert np.max(np.abs(left[:100])) == 0.0
    assert left[299] == pytest.approx(left[100])
    assert left[300] == pytest.approx(left[100] * 0.5, rel=1e-5)


def test_set_note_panning_steps_channels():
    s = Sampler(dc_buffer())
    nid = s.note_on(60, volume=1.0, panning=0.0, time=0)
    s.set_note_panning(nid, 1.0, time=512)  # hard right
    out = render(s, N)
    assert out[0][511] == pytest.approx(out[1][511])
    assert abs(out[0][512]) < 1e-6  # left muted
    assert out[1][512] > out[1][511]  # right boosted


def test_set_note_speed_instant_changes_read_rate():
    frames = 4 * N
    s = Sampler(ramp_buffer(4 * frames))
    nid = s.note_on(60, volume=1.0, time=0)
    s.set_note_speed(nid, 2.0, time=N)  # double speed at block 1
    out = render(s, frames)
    # output (ramp buffer) is the read position / SR; slope = speed
    pos = out[0] * SR  # ramp buffer: output is read position / SR
    slope0 = pos[N - 1] - pos[N - 2]
    slope1 = pos[N + 2] - pos[N + 1]
    assert slope0 == pytest.approx(1.0, abs=2e-2)
    assert slope1 == pytest.approx(2.0, abs=2e-2)


def test_set_note_speed_glide_matches_reference():
    frames = 16 * N
    s = Sampler(ramp_buffer(4 * frames))
    nid = s.note_on(60, volume=1.0, time=0)
    s.set_note_speed(nid, 2.0, glide=24.0, time=N)
    out = render(s, frames)
    pos = out[0].astype(np.float64) * SR

    speeds = np.ones(frames)
    speeds[N:] = reference_glide(1.0, 2.0, 24.0, SR, frames - N)
    ref_pos = np.concatenate([[0.0], np.cumsum(speeds)[:-1]])
    err = np.abs(pos - ref_pos)
    assert err.max() < 64.0, err.max()  # < ~1.3 ms of position error
    tail = pos[-N:]
    assert (tail[-1] - tail[0]) / (N - 1) == pytest.approx(2.0, rel=1e-3)


def test_automation_for_unknown_note_id_is_ignored():
    s = Sampler(dc_buffer())
    s.note_on(60, volume=1.0, time=0)
    s.set_note_volume(999999, 0.0, time=100)  # no such note
    out = render(s, N)
    assert out[0][101] == pytest.approx(out[0][0])


def test_synth_note_speed_glide_shifts_frequency():
    from phonic_tpu.generators.synth import SynthGenerator
    from phonic_tpu.synths import organ

    g = SynthGenerator(organ(), release_secs=0.05)
    nid = g.note_on(69, volume=1.0, time=0)  # A4 = 440 Hz
    g.set_note_speed(nid, 2.0 ** (12.0 / 12.0 + 9.0 / 12.0), time=4 * N)
    # absolute multiplier rel. note 60: A4 speed0 = 2^(9/12); doubling it
    # targets 880 Hz
    main = Mixer("main")
    main.add_source(g)
    prog = RenderProgram(main, CFG)
    out = np.asarray(prog.render(duration_frames=8 * N))

    def zc(seg):
        return np.sum((seg[:-1] < 0) & (seg[1:] >= 0)) / (len(seg) / SR)

    f_before = zc(out[0, 2 * N : 4 * N])
    f_after = zc(out[0, 5 * N : 7 * N])
    assert abs(f_before - 440.0) < 15.0, f_before
    assert abs(f_after - 880.0) < 25.0, f_after


def test_set_loop_range_at_runtime():
    """SamplerMessage::SetLoopRange (reference sampler.rs:1246-1270):
    enable a loop mid-playback on a non-looping buffer, then disable it."""
    frames = 8 * N
    s = Sampler(ramp_buffer(frames))
    s.note_on(60, volume=1.0, time=0)
    s.set_loop_range((1000, 2000), time=N)       # loop on from block 1
    s.set_loop_range(None, time=5 * N)           # loop off from block 5
    out = render(s, 8 * N)
    pos = out[0] * SR
    # block 0: linear read
    assert pos[N - 1] == pytest.approx(N - 1, abs=0.5)
    # blocks 1-4: position folded into [1000, 2000)
    mid = pos[2 * N : 5 * N]
    assert mid.min() >= 999.0 and mid.max() < 2000.5
    # after disabling, position escapes the loop and keeps increasing
    tail = pos[6 * N : 7 * N]
    assert tail[-1] > 2000.0
    assert np.all(np.diff(tail) > 0.5)


def test_set_loop_range_validation():
    s = Sampler(ramp_buffer(1000))
    with pytest.raises(ValueError):
        s.set_loop_range((500, 2000))
    with pytest.raises(ValueError):
        s.set_loop_range((-5, 100))


def test_automation_arriving_mid_playback_retraces_once():
    """The no-automation render compiles a scalar voice path; the first
    set_note_* event adds the event arrays to the block inputs, which
    retraces the step exactly once and keeps rendering."""
    s = Sampler(dc_buffer())
    nid = s.note_on(60, volume=1.0, time=0)
    main = Mixer("main")
    main.add_source(s)
    prog = RenderProgram(main, CFG)
    state = prog.init_state()
    state, a0 = prog._jit_step(state, prog.block_inputs(0))
    assert prog.jit_cache_size() == 1
    s.set_note_volume(nid, 0.25, time=N + 100)  # arrives after block 0
    state, a1 = prog._jit_step(state, prog.block_inputs(1))
    assert prog.jit_cache_size() == 2  # one-time retrace, then steady
    state, a2 = prog._jit_step(state, prog.block_inputs(2))
    assert prog.jit_cache_size() == 2
    a1 = np.asarray(a1)
    assert a1[0][99] == pytest.approx(np.asarray(a0)[0][0])
    assert a1[0][100] == pytest.approx(a1[0][99] * 0.25, rel=1e-5)
