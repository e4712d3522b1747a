"""Small parity sweep (VERDICT r1 item 7): streamed runtime
SetLoopRange/SetRepeat, per-source CPU-load probes, Position emit-rate
throttling."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from phonic_tpu import (AudioFileBuffer, EngineConfig, FilePlaybackOptions,
                        FileSource, Mixer, RenderProgram)
from phonic_tpu.outputs.null import NullOutput
from phonic_tpu.player import Player, PlayerConfig
from phonic_tpu.sources.streamed import StreamedFileSource

SR = 48000


def ramp_buffer(frames=4000, loop=None):
    # the ramp makes source read positions directly observable
    x = np.linspace(0.0, 1.0, frames, dtype=np.float32)
    return AudioFileBuffer.from_array(x[None, :], SR, loop_range=loop)


def render(src, frames, block=1024):
    m = Mixer("main")
    m.add_source(src)
    prog = RenderProgram(m, EngineConfig(sample_rate=SR, block_frames=block))
    return prog.render(duration_frames=frames)


def test_streamed_set_loop_range_mid_playback():
    """reference: StreamedFileSourceMessage::SetLoopRange
    (src/source/file/streamed.rs:37-50)."""
    b = ramp_buffer(4000, loop=(1000, 2000))
    src = StreamedFileSource(b, FilePlaybackOptions(repeat=None,
                                                    fade_out_secs=0.0))
    # at output frame 8192 move the loop to a later, narrower range
    src.set_loop_range((3000, 3500), time=8192)
    out = render(src, 16384)[0]
    # before the change: loops over [1000, 2000) -> values in [0.25, 0.50)
    pre = out[4000:8000]
    assert pre.min() >= 0.24 and pre.max() <= 0.51
    # position stays continuous at the switch (no jump bigger than a loop
    # wrap step in the first block after the change)
    # after reaching the new range: values in [0.75, 0.875)
    post = out[12000:16000]
    assert post.min() >= 0.74 and post.max() <= 0.88
    # switching is seamless: the sample right after the change continues
    # from the old position (still inside [0.25, 0.51) or walking toward
    # the new range), never silence
    assert np.all(np.abs(out[8192:8700]) > 0.05)


def test_streamed_set_loop_range_disable():
    b = ramp_buffer(4000, loop=(1000, 2000))
    src = StreamedFileSource(b, FilePlaybackOptions(repeat=None,
                                                    fade_out_secs=0.0))
    # disable looping AND end the endless repeat: play through to the end
    # (with repeat=None alone the whole file would replay forever, like the
    # reference decoder restarting at EOF)
    src.set_loop_range(None, time=4096)
    src.set_repeat(0, time=4096)
    out = render(src, 12288)[0]
    # after disabling, the ramp runs to 1.0 and the source exhausts
    peak_idx = int(np.argmax(out))
    assert out[peak_idx] > 0.95
    assert np.all(out[peak_idx + 8 :] < 1e-6)  # silent after the end


def test_streamed_set_repeat_mid_playback():
    """reference: StreamedFileSourceMessage::SetRepeat."""
    b = ramp_buffer(4000, loop=(1000, 2000))
    src = StreamedFileSource(b, FilePlaybackOptions(repeat=None,
                                                    fade_out_secs=0.0))
    src.set_repeat(1, time=6000)  # one more pass, then play out the tail
    out = render(src, 20000)[0]
    # eventually exits the loop, plays the tail to 1.0 and stops
    peak_idx = int(np.argmax(out))
    assert out[peak_idx] > 0.95
    assert np.all(out[peak_idx + 8 :] < 1e-6)
    # but it kept looping for a while after the message (one more pass)
    assert peak_idx > 8000


def test_streamed_messages_via_handle():
    player = Player(NullOutput(SR, 2), PlayerConfig(block_frames=2048))
    b = ramp_buffer(4000, loop=(1000, 2000))
    h = player.play_file(b, FilePlaybackOptions(repeat=None,
                                                fade_out_secs=0.0),
                         stream=True)
    h.send_message(("set_loop_range", (3000, 3500)), at=4096)
    h.send_message(("set_repeat", 0), at=8192)
    player.run(duration_frames=16384)  # must not raise; source exhausts


def test_position_emit_rate_throttles_events():
    """reference: playback_pos_emit_rate (src/source/file.rs:92-110)."""
    player = Player(NullOutput(SR, 2), PlayerConfig(block_frames=2048))
    events = []
    player.status_handler = events.append
    x = np.zeros((1, SR), np.float32)
    x[0, :] = 0.1
    buf = AudioFileBuffer.from_array(x, SR)
    player.play_file(buf, FilePlaybackOptions(
        fade_out_secs=0.0, playback_pos_emit_rate=0.25))
    player.run(duration_frames=SR)
    pos = [e.position for e in events if e.kind == "position"]
    # 1 s at 0.25 s rate -> about 4 events (not one per 2048-frame block)
    assert 2 <= len(pos) <= 6, pos
    gaps = np.diff(pos)
    assert np.all(gaps >= 0.25 * SR - 2048), gaps

    # rate None suppresses Position events entirely (stop still fires)
    player2 = Player(NullOutput(SR, 2), PlayerConfig(block_frames=2048))
    ev2 = []
    player2.status_handler = ev2.append
    player2.play_file(buf, FilePlaybackOptions(
        fade_out_secs=0.0, playback_pos_emit_rate=None))
    player2.run(duration_frames=SR)
    kinds = [e.kind for e in ev2]
    assert "position" not in kinds and "stopped" in kinds


def test_per_source_cpu_load_probe():
    """reference: measure_cpu_load option + FilePlaybackHandle::cpu_load
    (src/source/measured.rs:90-104, src/player/handles/file.rs:70-74)."""
    player = Player(NullOutput(SR, 2), PlayerConfig(block_frames=2048))
    h_on = player.play_file(ramp_buffer(), FilePlaybackOptions(
        measure_cpu_load=True, fade_out_secs=0.0))
    h_off = player.play_file(ramp_buffer(), FilePlaybackOptions(
        fade_out_secs=0.0))
    player.run(duration_frames=4096)
    load = h_on.cpu_load()
    assert load is not None and load.average > 0.0
    assert load.peak >= load.average
    assert h_off.cpu_load() is None


def test_generator_cpu_load_probe():
    """reference: GeneratorPlaybackHandle::cpu_load
    (src/player/handles/generator.rs:75-79)."""
    from phonic_tpu.generators.sampler import Sampler
    from phonic_tpu.generators.base import GeneratorPlaybackOptions

    player = Player(NullOutput(SR, 2), PlayerConfig(block_frames=2048))
    g = Sampler(ramp_buffer(), GeneratorPlaybackOptions(voices=4,
                                                        measure_cpu_load=True))
    h = player.play_generator(g)
    h.note_on(60, volume=0.5)
    player.run(duration_frames=4096)
    load = h.cpu_load()
    assert load is not None and load.average > 0.0


def test_effect_movement_variants():
    """reference: EffectMovement Start/End/Direction (src/player.rs:75-82,
    940-975) — movement stays within the owning mixer and errors for a
    foreign effect."""
    from phonic_tpu.effects.gain import GainEffect
    from phonic_tpu.errors import NotFoundError

    player = Player(NullOutput(SR, 2), PlayerConfig(block_frames=2048))
    sub = player.add_mixer()  # the main mixer keeps its master gain last
    a = GainEffect(gain=0.9, name="a")
    b = GainEffect(gain=0.8, name="b")
    c = GainEffect(gain=0.7, name="c")
    for e in (a, b, c):
        player.add_effect(e, mixer=sub.mixer)
    m = sub.mixer
    assert [e.name for e in m.effects] == ["a", "b", "c"]
    player.move_effect(c, "start", mixer=m)
    assert m.effects[0].name == "c"
    player.move_effect(c, "end", mixer=m)
    assert m.effects[-1].name == "c"
    player.move_effect(c, ("by", -1), mixer=m)
    assert m.effects[1].name == "c"
    player.move_effect(c, 0, mixer=m)
    assert m.effects[0].name == "c"

    import pytest as _pytest
    with _pytest.raises(NotFoundError):
        player.move_effect(c, "start")  # c is not on the main mixer
