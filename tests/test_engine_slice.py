"""End-to-end play-file slice: buffer -> resample -> gain/pan events -> mix
-> render.  Mirrors the reference's offline path (examples/play-file.rs with
-o, src/output/wav.rs:210-250) and cross-checks the whole composition against
the already-unit-tested NumPy oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from phonic_tpu import (
    AudioFileBuffer, EngineConfig, FilePlaybackOptions, FileSource, Mixer,
    RenderProgram,
)
from phonic_tpu.effects.gain import GainEffect
from phonic_tpu.sources.file import VOLUME, PANNING

import reference_dsp as ref

SR = 48000
CFG = EngineConfig(sample_rate=SR, channels=2, block_frames=2048, max_events_per_block=8)


def tone_buffer(frames=9600, sr=44100, freq=440.0, channels=1):
    t = np.arange(frames) / sr
    x = np.stack([0.5 * np.sin(2 * np.pi * freq * (c + 1) * t) for c in range(channels)])
    return AudioFileBuffer.from_array(x.astype(np.float32), sr)


def hermite_np(buf, pos):
    out = np.zeros(len(pos))
    n = len(buf)
    for j, p in enumerate(pos):
        k = int(np.floor(p))
        f = p - k
        g = lambda i: buf[i] if 0 <= i < n else 0.0
        ym1, y0, y1, y2 = g(k - 1), g(k), g(k + 1), g(k + 2)
        c1 = (y1 - ym1) * 0.5
        c2 = ym1 - y0 * 2.5 + y1 * 2.0 - y2 * 0.5
        c3 = (y2 - ym1) * 0.5 + (y0 - y1) * 1.5
        out[j] = ((c3 * f + c2) * f + c1) * f + y0
    return out


def test_play_file_with_scheduled_events_matches_oracle():
    buf = tone_buffer()
    src = FileSource(buf, FilePlaybackOptions(volume=0.8, fade_out_secs=0.0))
    main = Mixer("main")
    main.add_source(src)
    prog = RenderProgram(main, CFG)

    # schedule: volume to 0.2 at frame 3000, pan hard left at frame 6000
    prog.set_parameter(src, VOLUME.id, 0.2, at_frame=3000)
    prog.set_parameter(src, PANNING.id, -1.0, at_frame=6000)

    out = prog.render()
    dur = prog.natural_duration_frames()
    assert out.shape == (2, dur)

    # oracle: hermite-resampled mono duplicated to stereo, exp-smoothed gain
    # and pan trajectories.  The engine (like the reference's
    # CubicInterpolator) quantizes the rate ratio to f32.
    ratio = np.float64(np.float32(44100 / SR))
    mono = np.asarray(buf.data[0], np.float64)
    pos = np.arange(dur) * ratio
    raw = hermite_np(mono, pos)
    raw[pos >= buf.frames] = 0.0

    vol = ref.ExpSmoother(0.8, SR)
    pan = ref.ExpSmoother(0.0, SR)
    gains = np.empty(dur)
    pans = np.empty(dur)
    for i in range(dur):
        if i == 3000:
            vol.set_target(0.2)
        if i == 6000:
            pan.set_target(-1.0)
        gains[i] = vol.next()
        pans[i] = pan.next()
    left = np.array([ref.panning_factors(p)[0] for p in pans])
    right = np.array([ref.panning_factors(p)[1] for p in pans])
    expected = np.stack([raw * gains * left, raw * gains * right])

    peak = np.max(np.abs(expected))
    # full render (incl. the EOF guard-frame transition, where f32 position
    # quantization meets a discontinuity): -80 dB
    err_all = ref.error_db(out, expected, ref_peak=peak)
    assert err_all < -80.0, f"slice error {err_all:.1f} dB"
    # everywhere except the final EOF sample: -90 dB
    err = ref.error_db(out[:, :-4], expected[:, :-4], ref_peak=peak)
    assert err < -90.0, f"slice error {err:.1f} dB"


def test_scan_and_loop_modes_agree():
    buf = tone_buffer(4800)
    src = FileSource(buf, FilePlaybackOptions(fade_out_secs=0.0))
    main = Mixer("main")
    main.add_source(src)
    prog = RenderProgram(main, CFG)
    a = prog.render(mode="scan")
    b = prog.render(mode="loop")
    np.testing.assert_allclose(a, b, atol=1e-7)


def test_stop_with_fadeout():
    buf = tone_buffer(96000, sr=SR)  # 2s at engine rate (no resampling)
    src = FileSource(buf, FilePlaybackOptions(fade_out_secs=0.05))
    main = Mixer("main")
    main.add_source(src)
    prog = RenderProgram(main, CFG)
    prog.stop_source(src, at_frame=10000)
    out = prog.render(duration_frames=16000)
    # the exponential fader is ~99% done after 50ms and keeps decaying
    fade_end = 10000 + int(0.05 * SR)
    assert np.max(np.abs(out[:, fade_end + 1500:])) < 2e-3
    # still audible right before stop
    assert np.max(np.abs(out[:, 9000:10000])) > 0.1
    # no click: bounded sample-to-sample delta through the fade region
    d = np.abs(np.diff(out[0, 9900:12000]))
    assert d.max() < 0.05


def test_repeat_and_loop_range():
    frames = 1000
    buf = tone_buffer(frames, sr=SR)
    src = FileSource(buf, FilePlaybackOptions(repeat=2, fade_out_secs=0.0))
    main = Mixer("main")
    main.add_source(src)
    prog = RenderProgram(main, EngineConfig(sample_rate=SR, block_frames=512))
    out = prog.render()
    assert out.shape[1] == 3 * frames
    np.testing.assert_allclose(out[:, :frames], out[:, frames:2 * frames], atol=1e-5)

    # loop range loops forever until stopped
    buf2 = AudioFileBuffer.from_array(
        np.asarray(buf.data[:, :-1]), SR, loop_range=(200, 800)
    )
    src2 = FileSource(buf2, FilePlaybackOptions(repeat=None, fade_out_secs=0.0))
    main2 = Mixer("main")
    main2.add_source(src2)
    prog2 = RenderProgram(main2, EngineConfig(sample_rate=SR, block_frames=512))
    out2 = prog2.render(duration_frames=5000)
    # after entering the loop, period is 600 frames
    np.testing.assert_allclose(out2[0, 1000:1600], out2[0, 1600:2200], atol=1e-4)


def test_gain_effect_in_chain():
    buf = tone_buffer(4800, sr=SR)
    src = FileSource(buf, FilePlaybackOptions(fade_out_secs=0.0))
    main = Mixer("main")
    main.add_source(src)
    fx = main.add_effect(GainEffect(gain=0.5))
    prog = RenderProgram(main, CFG)
    out = prog.render()

    main2 = Mixer("main")
    main2.add_source(FileSource(buf, FilePlaybackOptions(fade_out_secs=0.0)))
    out2 = RenderProgram(main2, CFG).render()
    np.testing.assert_allclose(out, 0.5 * out2, atol=1e-6)


def test_submixer_summation():
    buf = tone_buffer(4800, sr=SR)
    main = Mixer("main")
    sub1 = main.add_mixer(Mixer("sub1"))
    sub2 = main.add_mixer(Mixer("sub2"))
    sub1.add_source(FileSource(buf, FilePlaybackOptions(fade_out_secs=0.0)))
    sub2.add_source(FileSource(buf, FilePlaybackOptions(volume=0.25, fade_out_secs=0.0)))
    prog = RenderProgram(main, CFG)
    out = prog.render()

    solo = Mixer("main")
    solo.add_source(FileSource(buf, FilePlaybackOptions(fade_out_secs=0.0)))
    base = RenderProgram(solo, CFG).render()
    np.testing.assert_allclose(out, 1.25 * base, atol=1e-5)


def test_start_time_scheduling():
    buf = tone_buffer(2000, sr=SR)
    src = FileSource(buf, FilePlaybackOptions(start_time=3000, fade_out_secs=0.0))
    main = Mixer("main")
    main.add_source(src)
    prog = RenderProgram(main, EngineConfig(sample_rate=SR, block_frames=1024))
    out = prog.render()
    assert np.all(out[:, :3000] == 0.0)
    assert np.max(np.abs(out[:, 3000:3100])) > 0.1
    assert out.shape[1] == 5000


def test_normalized_parameter_and_pending_event_removal():
    """ParameterValueUpdate::Normalized + MixerMessage::RemoveAllPendingEvents."""
    from phonic_tpu.graph.engine import NEVER

    main = Mixer("main")
    src = FileSource(tone_buffer(), FilePlaybackOptions(fade_out_secs=0.0))
    main.add_source(src)
    prog = RenderProgram(main, CFG)
    # normalized 1.0 on a Decibel-scaled volume = the max (+12 dB for VOLU)
    prog.set_parameter_normalized(src, "VOLU", 1.0, at_frame=0)
    tl = prog.timelines[(prog._resolve(src), "VOLU")]
    assert tl.values[-1] == pytest.approx(src.param("VOLU").max)
    # schedule junk, then wipe it
    prog.set_parameter(src, "VOLU", 0.5, at_frame=5000)
    prog.set_parameter(src, "PANN", -1.0, at_frame=6000)
    prog.stop_source(src, at_frame=7000)
    prog.remove_pending_events(after_frame=1000)
    assert all(t < 1000 for t in tl.times)
    assert prog.stop_frames[prog._resolve(src)] == NEVER


def test_effect_auto_bypass_matches_active_render():
    """EffectProcessor auto-bypass (reference mixed/effect.rs): with the
    cond enabled, audible output is identical and the bypass counter opens
    the effect when audio arrives and re-bypasses after tail + 2 s."""
    import dataclasses as _dc
    from phonic_tpu.effects.gain import GainEffect

    buf = tone_buffer(frames=4096)
    for cfg in (CFG, _dc.replace(CFG, auto_bypass=True)):
        main = Mixer("main")
        src = FileSource(buf, FilePlaybackOptions(fade_out_secs=0.0,
                                                  start_time=2048))
        main.add_source(src)
        main.add_effect(GainEffect(gain=0.5))
        prog = RenderProgram(main, cfg)
        out = np.asarray(prog.render(duration_frames=8 * 2048, mode="loop"))
        if cfg.auto_bypass:
            got_bypass = out
        else:
            got_plain = out
    np.testing.assert_allclose(got_bypass, got_plain, atol=1e-7)
    assert np.max(np.abs(got_plain)) > 0.1  # the tone actually played
