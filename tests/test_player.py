"""Player facade: handles, transport, metering, outputs."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from phonic_tpu.io import read_wav
from phonic_tpu.io.decoder import AudioFileBuffer
from phonic_tpu.player import Player, PlayerConfig
from phonic_tpu.outputs.wav_out import WavOutput
from phonic_tpu.outputs.null import NullOutput
from phonic_tpu.sources.file import FilePlaybackOptions
from phonic_tpu.sources.synth import SynthPlaybackOptions
from phonic_tpu.effects.filter import FilterEffect
from phonic_tpu.generators.sampler import AhdsrConfig, Sampler
from phonic_tpu import synths

SR = 48000


def tone_buffer(frames=24000, freq=440.0):
    t = np.arange(frames) / SR
    return AudioFileBuffer.from_array(
        (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)[None, :], SR)


def test_play_file_to_wav_output(tmp_path):
    out_path = tmp_path / "render.wav"
    out = WavOutput(out_path, SR, 2)
    player = Player(out, PlayerConfig(block_frames=2048))
    h = player.play_file(tone_buffer(), FilePlaybackOptions(volume=0.7))
    assert h.is_playing()
    player.run()
    player.close()
    audio, info = read_wav(out_path)
    assert info.channels == 2 and audio.shape[1] >= 24000
    assert np.abs(audio).max() > 0.3
    assert not h.is_playing()


def test_scheduled_handle_control(tmp_path):
    out = WavOutput(tmp_path / "a.wav", SR, 2)
    player = Player(out, PlayerConfig(block_frames=2048))
    h = player.play_file(tone_buffer(frames=48000),
                         FilePlaybackOptions(fade_out_secs=0.01))
    h.set_volume(0.1, at=10000)
    h.stop(at=30000)
    player.run(duration_frames=40960)
    audio = out.audio()
    # volume drop applied
    assert np.abs(audio[:, 12000:16000]).max() < 0.12
    # stopped + faded
    assert np.abs(audio[:, 33000:]).max() < 1e-3


def test_player_mixer_tree_and_effects():
    player = Player(NullOutput(SR, 2), PlayerConfig(block_frames=2048))
    sub = player.add_mixer()
    player.play_file(tone_buffer(), mixer=sub.mixer)
    fx = sub.add_effect(FilterEffect(cutoff=500.0))
    fx.set_parameter("cuto", 1000.0, at=0)
    player.run()
    assert player.position > 0
    s = str(player)
    assert "Mixer 'main'" in s and "FilterEffect" in s
    # master gain stays last on the main bus
    assert player.main_mixer.effects[-1].name == "master"


def test_player_generator_and_metrics():
    player = Player(NullOutput(SR, 2), PlayerConfig(block_frames=2048))
    g = player.play_generator(Sampler(tone_buffer(),
                                      envelope=AhdsrConfig(release=0.05)))
    nid = g.note_on(60, volume=0.9, at=0)
    g.note_off(nid, at=12000)
    player.run()
    lvl = player.audio_level()
    assert lvl.peak.shape == (2,)
    cpu = player.cpu_load()
    assert cpu.average > 0.0
    # master volume control exists
    player.set_volume(0.5)


def test_player_synth_and_async_pump():
    player = Player(NullOutput(SR, 2, realtime=True, buffer_secs=0.05),
                    PlayerConfig(block_frames=2048))
    player.play_synth(synths.organ(), SynthPlaybackOptions(duration=200000))
    player.render_block()  # compile before timing the pump
    player.run_async()
    import time
    time.sleep(0.5)
    player.stop()
    # realtime pacing: position should be roughly wall-clock * sr, not huge
    assert 2048 < player.position < SR * 4
    player.close()


def test_seek_and_waveform_and_checkpoint(tmp_path):
    from phonic_tpu.ops import waveform
    from phonic_tpu import checkpoint
    from phonic_tpu import Mixer, RenderProgram, EngineConfig, FileSource

    # seek: ramp buffer makes the jump visible
    ramp = AudioFileBuffer.from_array(
        np.linspace(0, 1, 48000, dtype=np.float32)[None, :], SR)
    out = WavOutput(tmp_path / "s.wav", SR, 2)
    player = Player(out, PlayerConfig(block_frames=2048))
    h = player.play_file(ramp, FilePlaybackOptions(fade_out_secs=0.0))
    h.seek(24000, at=8192)  # jump forward at block 4
    player.run(duration_frames=16384)
    audio = out.audio()
    assert abs(audio[0, 8192] - 0.5) < 0.01  # jumped to the middle
    assert abs(audio[0, 8191] - 8191 / 48000) < 0.01  # pre-seek untouched

    # waveform display
    mins, maxs = waveform.mixed_down(audio, 64)
    assert mins.shape == (64,) and np.all(maxs >= mins)

    # checkpoint/resume: identical continuation
    m = Mixer("main")
    src = FileSource(ramp, FilePlaybackOptions(fade_out_secs=0.0))
    m.add_source(src)
    prog = RenderProgram(m, EngineConfig(sample_rate=SR, block_frames=2048))
    state = prog.init_state()
    state, y1 = prog._jit_step(state, prog.block_inputs(0))
    snap = checkpoint.save_state(state, tmp_path / "ckpt.pkl")
    state, y2 = prog._jit_step(state, prog.block_inputs(1))
    resumed = checkpoint.load_state(tmp_path / "ckpt.pkl")
    _, y2b = prog._jit_step(resumed, prog.block_inputs(1))
    np.testing.assert_array_equal(np.asarray(y2), np.asarray(y2b))


def test_checkpoint_resume_across_rebuild_and_mismatch(tmp_path):
    """Checkpoint mid-render, rebuild the same topology, adopt, resume: the
    continuation must bit-match an uninterrupted render.  Resuming into a
    structurally different program must raise CheckpointError (VERDICT r3
    #6), not an opaque tree error inside jit."""
    from phonic_tpu import checkpoint
    from phonic_tpu import Mixer, RenderProgram, EngineConfig, FileSource
    from phonic_tpu.effects.gain import GainEffect
    from phonic_tpu.errors import CheckpointError

    def build(extra_effect=False, block=2048):
        ramp = AudioFileBuffer.from_array(
            np.linspace(0, 1, 48000, dtype=np.float32)[None, :], SR)
        m = Mixer("main")
        # explicit names: auto-named nodes get process-global sequence
        # numbers, so a rebuild would produce different state paths (resume
        # across rebuilds requires deterministic names)
        m.add_source(FileSource(ramp, FilePlaybackOptions(fade_out_secs=0.0),
                                name="src"))
        if extra_effect:
            m.add_effect(GainEffect(gain=0.5, name="g"))
        return RenderProgram(m, EngineConfig(sample_rate=SR,
                                             block_frames=block))

    prog = build()
    state = prog.init_state()
    state, _ = prog._jit_step(state, prog.block_inputs(0))
    checkpoint.save_state(state, tmp_path / "ckpt.pkl", program=prog)
    state, y1 = prog._jit_step(state, prog.block_inputs(1))

    # resume into a freshly-built identical program
    prog2 = build()
    resumed = checkpoint.load_state(tmp_path / "ckpt.pkl", program=prog2)
    resumed = prog2.adopt(prog, resumed)
    _, y1b = prog2._jit_step(resumed, prog2.block_inputs(1))
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y1b))

    # topology drift -> clear error
    prog3 = build(extra_effect=True)
    with pytest.raises(CheckpointError, match="topology|structure"):
        checkpoint.load_state(tmp_path / "ckpt.pkl", program=prog3)

    # config drift (block size) -> clear error
    prog4 = build(block=4096)
    with pytest.raises(CheckpointError):
        checkpoint.load_state(tmp_path / "ckpt.pkl", program=prog4)


def test_nan_guard_silences_and_reports():
    from phonic_tpu.sources.synth import SynthDef, SynthPlaybackOptions
    import jax.numpy as jnp

    def bad_render(state, ctx):
        return state, jnp.full((ctx.block_frames,), jnp.nan)

    player = Player(NullOutput(SR, 2), PlayerConfig(block_frames=1024))
    reports = []
    player.panic_handler = reports.append
    player.play_synth(SynthDef(init=lambda c: {}, render=bad_render),
                      SynthPlaybackOptions(duration=4096))
    player.run(duration_frames=4096)
    assert reports, "panic handler not called"
    assert np.all(player.audio_level().peak == 0.0)


def test_playback_status_events():
    from phonic_tpu.player import PlaybackStatusEvent

    player = Player(NullOutput(SR, 2), PlayerConfig(block_frames=2048))
    events = []
    player.status_handler = events.append
    player.play_file(tone_buffer(frames=10000), FilePlaybackOptions(fade_out_secs=0.0))
    player.run(duration_frames=16384)
    kinds = [e.kind for e in events]
    assert "position" in kinds and "stopped" in kinds
    # positions advance monotonically while playing
    pos = [e.position for e in events if e.kind == "position"]
    assert pos == sorted(pos) and pos[-1] > 0


def test_playback_status_context():
    """Opaque contexts ride every status event of their playback
    (reference: PlaybackStatusContext, src/source/status.rs:9-36;
    play_file_with_context, src/source/file.rs:282-297)."""
    player = Player(NullOutput(SR, 2), PlayerConfig(block_frames=2048))
    events = []
    player.status_handler = events.append
    ctx = {"tag": "intro-stem"}
    h = player.play_file(tone_buffer(frames=10000),
                         FilePlaybackOptions(fade_out_secs=0.0), context=ctx)
    plain = player.play_file(tone_buffer(frames=10000),
                             FilePlaybackOptions(fade_out_secs=0.0))
    assert h.playback_status_context() is ctx
    assert plain.playback_status_context() is None
    player.run(duration_frames=16384)
    tagged = [e for e in events if e.source is h._node]
    untagged = [e for e in events if e.source is plain._node]
    assert tagged and all(e.context is ctx for e in tagged)
    assert untagged and all(e.context is None for e in untagged)
    assert any(e.kind == "stopped" and e.context is ctx for e in tagged)
    # settable after play (file.rs:254-256)
    ctx2 = ("swapped",)
    h.set_playback_status_context(ctx2)
    assert h.playback_status_context() is ctx2


def test_note_on_context():
    """note_on_with_context analog (generator.rs:212-240)."""
    player = Player(NullOutput(SR, 2), PlayerConfig(block_frames=2048))
    s = Sampler(tone_buffer(frames=4000),
                envelope=AhdsrConfig(attack=0.0, release=0.05))
    g = player.play_generator(s, context="gen-ctx")
    nid = g.note_on(60, 0.8, context={"step": 3})
    other = g.note_on(64, 0.8)
    assert g.note_context(nid) == {"step": 3}
    assert g.note_context(other) is None
    assert g.playback_status_context() == "gen-ctx"
    player.run(duration_frames=4096)


def test_stop_all_and_remove_all():
    """Player::stop_all_sources / remove_all_effects / remove_all_mixers
    (src/player.rs:871-886, 994-1045) + pause/start/is_running
    (src/player.rs:495-509)."""
    player = Player(NullOutput(SR, 2), PlayerConfig(block_frames=2048))
    sub = player.add_mixer()
    sub2 = player.add_mixer()
    player.play_file(tone_buffer(frames=40000),
                     FilePlaybackOptions(fade_out_secs=0.0), mixer=sub.mixer)
    player.play_file(tone_buffer(frames=40000),
                     FilePlaybackOptions(fade_out_secs=0.0))
    fx = player.add_effect(FilterEffect(cutoff=800.0))
    player.render_block()
    assert np.max(np.abs(player.render_block())) > 0.0
    player.stop_all_sources()
    player.render_block()  # stop lands inside this block
    assert np.max(np.abs(player.render_block())) == 0.0
    player.remove_all_effects()
    assert fx._node not in player.main_mixer.effects
    assert player._master in player.main_mixer.effects  # master stays
    player.remove_all_mixers()
    assert player.main_mixer.children == []
    assert player.is_running()
    player.pause()
    assert not player.is_running()
    player.start()
    assert player.is_running()
    player.close()


def test_no_recompiles_in_steady_state():
    # the jit-recompile guard: the analog of the reference's assert_no_alloc
    player = Player(NullOutput(SR, 2), PlayerConfig(block_frames=1024))
    h = player.play_file(tone_buffer(frames=48000),
                         FilePlaybackOptions(fade_out_secs=0.0))
    player.render_block()
    prog = player._program
    size0 = prog.jit_cache_size()
    # schedule live control mid-render: must NOT recompile
    h.set_volume(0.5)
    h.set_panning(0.4)
    h.stop(at=40000)
    for _ in range(8):
        player.render_block()
    assert prog.jit_cache_size() == size0 == 1


def test_per_mixer_metering():
    player = Player(NullOutput(SR, 2), PlayerConfig(block_frames=2048))
    sub_loud = player.add_mixer()
    sub_quiet = player.add_mixer()
    player.play_file(tone_buffer(frames=20000), FilePlaybackOptions(
        volume=1.0, fade_out_secs=0.0), mixer=sub_loud.mixer)
    player.play_file(tone_buffer(frames=20000), FilePlaybackOptions(
        volume=0.05, fade_out_secs=0.0), mixer=sub_quiet.mixer)
    player.run(duration_frames=8192)
    loud = sub_loud.audio_level()
    quiet = sub_quiet.audio_level()
    assert loud.peak.max() > 5 * quiet.peak.max()
    assert np.all(loud.rms >= quiet.rms)


def test_topology_edit_keeps_sources_playing():
    """Live add of a source/effect must not restart what's already playing
    (reference: Player::add_source while running, src/player.rs)."""
    from phonic_tpu.effects.gain import GainEffect

    player = Player(NullOutput(SR, 2), PlayerConfig(block_frames=2048))
    frames = SR
    ramp = np.tile((np.arange(4 * frames, dtype=np.float32) / SR), (2, 1))
    h = player.play_file(AudioFileBuffer(ramp, SR),
                         FilePlaybackOptions(fade_out_secs=0.0, volume=1.0))
    player.run(duration_frames=4096)  # two blocks in

    # topology edit mid-playback: new source + an effect on a fresh submixer
    sub = player.add_mixer()
    player.play_file(tone_buffer(frames=20000),
                     FilePlaybackOptions(fade_out_secs=0.0, volume=1e-6),
                     mixer=sub.mixer)
    # keep pumping on the same player: render the next block directly
    prog = player._ensure_program()
    state = player._state
    state, audio = prog._jit_step(state, prog.block_inputs(2))
    audio = np.asarray(audio[0] if isinstance(audio, tuple) else audio)
    # the ramp source must CONTINUE from 4096 frames, not restart at 0
    lead = audio[0, :64] * SR
    assert lead[0] == pytest.approx(4096.0, abs=1.0), lead[0]
    assert np.all(np.diff(lead) > 0.4)


def test_topology_edit_bit_exact_mid_ramp():
    """An edit with a unity effect must be bit-identical to no edit — even
    with an exp volume ramp and a speed glide mid-flight and batched file
    lanes (regression: adopt once restarted batched sources from frame 0)."""
    from phonic_tpu.effects.gain import GainEffect

    t = np.arange(SR) / SR

    def run(edit):
        player = Player(NullOutput(SR, 2), PlayerConfig(block_frames=2048))
        hs = []
        for i in range(2):
            tone = (0.4 * np.sin(2 * np.pi * (220 + 110 * i) * t)).astype(np.float32)
            hs.append(player.play_file(
                AudioFileBuffer.from_array(tone[None, :], SR),
                FilePlaybackOptions(fade_out_secs=0.0)))
        blocks = [player.render_block() for _ in range(2)]
        hs[0].set_volume(0.05)            # exp smoother mid-trajectory
        hs[1].set_speed(1.5, glide=8.0)   # glide knots mid-flight
        blocks += [player.render_block()]
        if edit:
            player.add_effect(GainEffect(gain=1.0, name="extra"))
        blocks += [player.render_block() for _ in range(4)]
        player.close()
        return np.concatenate(blocks, axis=-1)

    np.testing.assert_array_equal(run(False), run(True))


def test_pipelined_run_matches_serial_render(tmp_path):
    """run()'s depth-1 pipelined pump is bit-identical to serial
    render_block pulls, and drains the final dispatched block on stop."""
    def mk(output):
        player = Player(output, PlayerConfig(block_frames=4096))
        h = player.play_file(tone_buffer(), FilePlaybackOptions(
            volume=0.7, panning=0.3, speed=1.21))
        h.set_volume(0.4, at=9000)
        return player

    # serial: pull blocks one at a time
    serial = mk(NullOutput(SR, 2))
    blocks = [serial.render_block() for _ in range(5)]
    want = np.concatenate(blocks, axis=-1)[:, :18000]

    # pipelined: the production run() loop into a wav
    out_path = tmp_path / "pipelined.wav"
    out = WavOutput(out_path, SR, 2)
    piped = mk(out)
    piped.run(duration_frames=18000)
    out.close()
    got, _ = read_wav(out_path)

    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_run_async_stop_drains_pending_block(tmp_path):
    """A quickly-stopped async pump still writes the block it dispatched
    (no audio drop at stop)."""
    out_path = tmp_path / "async.wav"
    out = WavOutput(out_path, SR, 2)
    player = Player(out, PlayerConfig(block_frames=4096))
    player.play_file(tone_buffer())
    out.write(player.render_block())  # compile + warm before pacing the pump
    t = player.run_async()
    import time as _time
    _time.sleep(0.3)
    player.stop()
    t.join(timeout=15)
    assert not t.is_alive()
    out.close()
    data, _ = read_wav(out_path)
    assert data.shape[-1] >= 4096
    assert np.isfinite(data).all() and np.abs(data).max() > 0


def test_split_runs_match_single_run(tmp_path):
    """Non-block-aligned run() calls chain seamlessly: the over-rendered
    tail is delivered by the NEXT run instead of re-rendering mid-block
    with desynced engine state (the engine itself only renders whole
    blocks; the Player edge buffers the remainder)."""
    def mk(output):
        player = Player(output, PlayerConfig(block_frames=4096))
        h = player.play_file(tone_buffer(), FilePlaybackOptions(
            volume=0.7, speed=1.13))
        h.set_volume(0.3, at=7000)
        return player

    one = WavOutput(tmp_path / "one.wav", SR, 2)
    p1 = mk(one)
    p1.run(duration_frames=15000)
    one.close()

    two = WavOutput(tmp_path / "two.wav", SR, 2)
    p2 = mk(two)
    delivered = 0
    for n in (5000, 2500, 4000, 3500):  # same 15000, all mid-block
        p2.run(duration_frames=n)
        delivered += n
        assert p2.position == delivered
    two.close()

    a, _ = read_wav(tmp_path / "one.wav")
    b, _ = read_wav(tmp_path / "two.wav")
    assert a.shape == b.shape == (2, 15000)
    np.testing.assert_array_equal(a, b)


def test_run_zero_duration_is_noop(tmp_path):
    out = WavOutput(tmp_path / "z.wav", SR, 2)
    player = Player(out, PlayerConfig(block_frames=4096))
    player.play_file(tone_buffer())
    player.run(duration_frames=0)
    assert player.position == 0
    player.run(duration_frames=8192)
    assert player.position == 8192
    player.run(duration_frames=0)  # must not disturb the buffered stream
    assert player.position == 8192
    out.close()
    audio, _ = read_wav(tmp_path / "z.wav")
    assert audio.shape[1] == 8192


def test_render_block_after_unaligned_run_is_contiguous():
    """render_block() after a non-aligned run() returns the next
    stream-contiguous window (tail first), not a desynced re-render."""
    def mk():
        player = Player(NullOutput(SR, 2), PlayerConfig(block_frames=4096))
        player.play_file(tone_buffer(), FilePlaybackOptions(speed=1.21))
        return player

    serial = mk()
    want = np.concatenate([serial.render_block() for _ in range(4)], axis=-1)

    mixed = mk()
    # NullOutput keeps no audio; recapture writes
    written = []
    orig_write = mixed.output.write
    mixed.output.write = lambda a: (written.append(np.asarray(a)), orig_write(a))
    mixed.run(duration_frames=6000)
    got = np.concatenate(written + [mixed.render_block(), mixed.render_block()],
                         axis=-1)
    np.testing.assert_array_equal(got, want[:, : got.shape[1]])
    assert got.shape[1] == 6000 + 2 * 4096


def test_output_suspended_tracks_device_state():
    player = Player(NullOutput(SR, 2), PlayerConfig(block_frames=4096))
    assert player.output_suspended is False
    player.pause()
    assert player.output_suspended is True
    player.start()
    assert player.output_suspended is False


def test_run_async_after_unaligned_run_is_contiguous(tmp_path):
    """The async pump serves the tail left by a prior non-aligned run()
    before rendering anything new."""
    import time as _time

    serial = Player(NullOutput(SR, 2), PlayerConfig(block_frames=4096))
    serial.play_file(tone_buffer(), FilePlaybackOptions(speed=1.21))
    want = np.concatenate([serial.render_block() for _ in range(4)], axis=-1)

    out_path = tmp_path / "tail_async.wav"
    out = WavOutput(out_path, SR, 2)
    player = Player(out, PlayerConfig(block_frames=4096))
    player.play_file(tone_buffer(), FilePlaybackOptions(speed=1.21))
    player.run(duration_frames=6000)
    t = player.run_async()
    _time.sleep(1.0)
    player.stop()
    t.join(timeout=15)
    out.close()
    got, _ = read_wav(out_path)
    assert got.shape[1] >= 6000 + 4096  # pump made progress past the tail
    n = min(got.shape[1], want.shape[1])
    np.testing.assert_array_equal(got[:, :n], want[:, :n])
