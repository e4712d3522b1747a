"""API-surface parity: option validation, handle ids, output introspection,
synth fade-in (reference: src/source/file.rs:197-217, synth.rs:128-143,
generator.rs:118-140, player.rs:407-441, player/handles/*.rs)."""

import numpy as np
import pytest

from phonic_tpu import EngineConfig, Mixer, RenderProgram
from phonic_tpu.errors import ParameterError
from phonic_tpu.generators.base import GeneratorPlaybackOptions
from phonic_tpu.io.decoder import AudioFileBuffer
from phonic_tpu.outputs.null import NullOutput
from phonic_tpu.player import Player, PlayerConfig
from phonic_tpu.sources.file import FilePlaybackOptions
from phonic_tpu.sources.synth import SynthPlaybackOptions, SynthSource
from phonic_tpu.effects.gain import GainEffect
from phonic_tpu import synths

SR = 48000


def tone_buffer(frames=12000, freq=440.0):
    t = np.arange(frames) / SR
    return AudioFileBuffer.from_array(
        (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)[None, :], SR)


# ---------------------------------------------------------------- validation

def test_file_options_validation():
    with pytest.raises(ParameterError):
        FilePlaybackOptions(volume=-0.5).validate()
    with pytest.raises(ParameterError):
        FilePlaybackOptions(volume=float("nan")).validate()
    with pytest.raises(ParameterError):
        FilePlaybackOptions(panning=1.5).validate()
    with pytest.raises(ParameterError):
        FilePlaybackOptions(speed=-1.0).validate()
    with pytest.raises(ParameterError):
        FilePlaybackOptions(speed=float("inf")).validate()
    FilePlaybackOptions(volume=0.0, panning=-1.0, speed=0.0).validate()


def test_synth_options_validation():
    with pytest.raises(ParameterError):
        SynthPlaybackOptions(volume=-1e-9).validate()
    with pytest.raises(ParameterError):
        SynthPlaybackOptions(panning=-2.0).validate()
    SynthPlaybackOptions(volume=2.0, panning=1.0).validate()


def test_generator_options_validation():
    with pytest.raises(ParameterError):
        GeneratorPlaybackOptions(voices=0).validate()
    with pytest.raises(ParameterError):
        GeneratorPlaybackOptions(panning=3.0).validate()
    GeneratorPlaybackOptions(voices=1).validate()


def test_invalid_options_raise_at_construction():
    # constructors validate eagerly (the reference validates in play_*)
    from phonic_tpu.sources.file import FileSource
    with pytest.raises(ParameterError):
        FileSource(tone_buffer(), FilePlaybackOptions(volume=-1.0))
    with pytest.raises(ParameterError):
        SynthSource(synths.organ(), SynthPlaybackOptions(panning=9.0))


# ---------------------------------------------------------------- handle ids

def test_handle_ids_unique_and_stable():
    player = Player(NullOutput(SR, 2), PlayerConfig(block_frames=2048))
    h1 = player.play_file(tone_buffer())
    h2 = player.play_file(tone_buffer())
    sub = player.add_mixer()
    fx = sub.add_effect(GainEffect())
    ids = {h1.id, h2.id, sub.id, fx.id}
    assert len(ids) == 4
    # stable across repeated reads
    assert h1.id == h1.id and fx.id == fx.id
    assert "gain" in fx.effect_name.lower()
    assert fx.mixer_id == sub.id
    player.close()


def test_effect_on_main_mixer_reports_main_id():
    player = Player(NullOutput(SR, 2), PlayerConfig(block_frames=2048))
    fx = player.add_effect(GainEffect())
    main_id = player._id_for(player.main_mixer)
    assert fx.mixer_id == main_id
    player.close()


# -------------------------------------------------- output introspection

def test_output_introspection():
    out = NullOutput(SR, 2)
    player = Player(out, PlayerConfig(block_frames=2048))
    assert player.output_sample_rate == SR
    assert player.output_channel_count == 2
    assert player.output_suspended is False
    assert player.output_volume == pytest.approx(1.0)
    player.set_output_volume(0.25)
    assert player.output_volume == pytest.approx(0.25)
    with pytest.raises(ParameterError):
        player.set_output_volume(-0.1)
    assert player.output_sample_frame_position >= 0
    player.close()


def test_state_accessors_and_panic_handler():
    player = Player(NullOutput(SR, 2), PlayerConfig(block_frames=2048))
    sub = player.add_mixer()
    player.play_file(tone_buffer(), mixer=sub.mixer)
    cpu_poll = player.cpu_load_state()
    lvl_poll = sub.audio_level_state()
    player.run(duration_frames=8192)
    assert cpu_poll().average >= 0.0
    assert lvl_poll().peak.shape == (2,)
    calls = []
    player.set_panic_handler(calls.append)
    assert player.panic_handler is not None
    player.set_panic_handler(None)
    assert player.panic_handler is None
    player.close()


# ---------------------------------------------------------------- fade-in

def test_synth_fade_in_ramps_up():
    def render(fade_in):
        src = SynthSource(synths.organ(), SynthPlaybackOptions(
            frequency=440.0, duration=30000, fade_in_secs=fade_in))
        m = Mixer("main")
        m.add_source(src)
        return RenderProgram(m, EngineConfig(sample_rate=SR, block_frames=4096)
                             ).render(duration_frames=24576)

    plain = render(0.0)
    faded = render(0.2)
    # early audio is attenuated by the fade...
    # exponential fader: 1 - exp(-t/tau), tau = fade_secs*sr/ln(100)
    early_ratio = (np.abs(faded[:, :500]).max()
                   / max(np.abs(plain[:, :500]).max(), 1e-9))
    assert early_ratio < 0.3
    mid_ratio = (np.abs(faded[:, :2000]).max()
                 / max(np.abs(plain[:, :2000]).max(), 1e-9))
    assert mid_ratio == pytest.approx(1.0 - np.exp(-2000 / (0.2 * SR / np.log(100))),
                                      abs=0.05)
    # ...and converges to the un-faded signal well past the fade
    late = slice(18000, 24000)
    assert np.abs(faded[:, late] - plain[:, late]).max() < 1e-3
    # fade envelope (faded/plain per-block RMS) is monotone non-decreasing
    def rms(sig):
        return np.sqrt((sig[0, :9728].reshape(-1, 512) ** 2).mean(axis=1))
    env = rms(faded) / np.maximum(rms(plain), 1e-9)
    assert np.all(np.diff(env) > -1e-3)


def test_pos_emit_rate_throttles_status_events():
    events = []
    player = Player(NullOutput(SR, 2), PlayerConfig(block_frames=2048))
    player.status_handler = events.append
    player.play_file(tone_buffer(frames=48000),
                     FilePlaybackOptions(playback_pos_emit_rate=0.1))
    player.run(duration_frames=49152)
    pos = [e for e in events if getattr(e, "kind", "") == "position"]
    # ~1 s of audio at 0.1 s emit rate -> around 10 events, never per-block
    assert 5 <= len(pos) <= 16
    player.close()


def test_pos_emit_rate_none_disables_positions():
    events = []
    player = Player(NullOutput(SR, 2), PlayerConfig(block_frames=2048))
    player.status_handler = events.append
    player.play_file(tone_buffer(frames=24000),
                     FilePlaybackOptions(playback_pos_emit_rate=None))
    player.run(duration_frames=24576)
    pos = [e for e in events if getattr(e, "kind", "") == "position"]
    assert pos == []
    player.close()
