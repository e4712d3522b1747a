"""Source/mixer removal + transient auto-retirement.

Behavioural spec: reference src/source/mixed.rs:47-194 (MixerMessage::
RemoveSource / RemoveMixer), mixed.rs:714-715 (exhausted transient sources
are retired every block) and src/player.rs:1135-1176 (playing-sources map
GC).  Here a retirement is a topology rebuild, so exhausted sources are
pruned lazily in batches; this suite checks the lifecycle bookkeeping stays
bounded and that unrelated sources render BIT-EXACTLY through removals."""

import numpy as np
import pytest

from phonic_tpu import AudioFileBuffer, Player, PlayerConfig
from phonic_tpu.errors import NotFoundError, PhonicError
from phonic_tpu.outputs.null import NullOutput
from phonic_tpu.sources.file import FilePlaybackOptions

SR = 48000
BLOCK = 512


def tone_buffer(frames, freq=440.0, amp=0.5):
    t = np.arange(frames) / SR
    x = (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    return AudioFileBuffer.from_array(x[None, :], SR)


def silent_buffer(frames):
    return AudioFileBuffer.from_array(np.zeros((1, frames), np.float32), SR)


def make_player(**cfg):
    out = NullOutput(SR, 2)
    return Player(out, PlayerConfig(block_frames=BLOCK, **cfg))


def test_remove_source_explicit():
    player = make_player(auto_retire_sources=False)
    keep = player.play_file(tone_buffer(40 * BLOCK),
                            FilePlaybackOptions(fade_out_secs=0.0))
    h = player.play_file(tone_buffer(40 * BLOCK, freq=220.0),
                         FilePlaybackOptions(fade_out_secs=0.0))
    for _ in range(3):
        player.render_block()
    player.remove_source(h._node)
    assert not h.is_playing()
    assert keep.is_playing()
    audio = player.render_block()
    assert np.max(np.abs(audio)) > 0.1  # the kept tone still plays
    with pytest.raises(NotFoundError):
        h.set_volume(0.5)
    with pytest.raises(NotFoundError):
        player.remove_source(h._node)


def test_remove_mixer_subtree():
    player = make_player(auto_retire_sources=False)
    sub = player.add_mixer()
    h = player.play_file(tone_buffer(40 * BLOCK), mixer=sub.mixer)
    keep = player.play_file(tone_buffer(40 * BLOCK, freq=330.0),
                            FilePlaybackOptions(fade_out_secs=0.0))
    player.render_block()
    sub.remove()
    assert not h.is_playing()
    assert keep.is_playing()
    player.render_block()
    with pytest.raises(NotFoundError):
        player.remove_mixer(sub.mixer)
    with pytest.raises(PhonicError):
        player.remove_mixer(player.main_mixer)


def test_removal_is_bit_exact_for_survivors():
    """A long tone rendered through add/remove churn must equal the same
    tone rendered alone, bit for bit (adopt() carries positions across the
    FileBatch regroupings every removal causes)."""
    frames = 40 * BLOCK
    opts = FilePlaybackOptions(fade_out_secs=0.0)

    control = make_player(auto_retire_sources=False)
    control.play_file(tone_buffer(frames), opts)
    expected = [control.render_block() for _ in range(20)]

    player = make_player(auto_retire_sources=False)
    player.play_file(tone_buffer(frames), opts)
    got = []
    churn = []
    for i in range(20):
        if i % 3 == 0:  # add a silent transient (batches with the tone)
            churn.append(player.play_file(silent_buffer(frames), opts))
        if i % 3 == 2:  # remove the oldest one mid-flight
            player.remove_source(churn.pop(0)._node)
        got.append(player.render_block())
    for i, (e, g) in enumerate(zip(expected, got)):
        assert np.array_equal(e, g), f"block {i} diverged through churn"


@pytest.mark.slow
def test_retirement_soak_keeps_graph_bounded():
    """Play many short files over a session: exhausted transients must be
    auto-retired so node count and bookkeeping stay bounded, while a
    long-lived tone keeps playing (reference: mixed.rs:714-715 retirement +
    player.rs:1135-1176 GC)."""
    threshold = 4
    player = make_player(retire_after_dead_sources=threshold)
    stopped = []
    player.status_handler = lambda ev: stopped.append(ev) \
        if ev.kind == "stopped" else None
    long_h = player.play_file(
        tone_buffer(4000 * BLOCK), FilePlaybackOptions(fade_out_secs=0.0))
    max_sources = 0
    n_files = 24
    for i in range(n_files):
        h = player.play_file(silent_buffer(2 * BLOCK),
                             FilePlaybackOptions(fade_out_secs=0.0))
        while h.is_playing():
            player.render_block()
            max_sources = max(max_sources, len(player.main_mixer.sources))
        player.render_block()
    # bounded: the long tone + at most threshold dead + the one in flight
    assert max_sources <= 2 + threshold + 1
    assert len(player.main_mixer.sources) <= 2 + threshold
    assert long_h.is_playing()
    # retired sources disappeared from bookkeeping too
    assert len(player._transient) <= threshold + 1
    assert len(player._last_pos_emit) <= len(player.main_mixer.sources)
    audio = player.render_block()
    assert np.max(np.abs(audio)) > 0.1


def test_retirement_respects_kill_schedule():
    """A killed source counts as exhausted immediately (kill_frames is part
    of the is_playing limit) and gets retired with the rest."""
    player = make_player(retire_after_dead_sources=1)
    h = player.play_file(tone_buffer(100 * BLOCK),
                         FilePlaybackOptions(fade_out_secs=0.0))
    player.render_block()
    h.kill()
    assert not h.is_playing()
    player.render_block()  # retirement pass runs at block end
    assert h._node not in player.main_mixer.sources


def test_batched_effect_tail_survives_sibling_removal():
    """An effect whose silence-age previously lived in a BATCH matrix must
    resume with age 0 after a rebuild makes it unbatched: removing its
    sibling mid-tail must not freeze the surviving, still-ringing tail
    behind the aged-out init sentinel (adopt() bypass-age carry)."""
    from phonic_tpu.effects.delay import DelayEffect

    player = make_player(auto_retire_sources=False)
    subs = [player.add_mixer() for _ in range(2)]
    for k, sub in enumerate(subs):
        sub.add_effect(DelayEffect(delay_ms=30.0, feedback=0.7, wet=1.0))
        player.play_file(tone_buffer(4 * BLOCK, freq=220.0 * (k + 1)),
                         FilePlaybackOptions(fade_out_secs=0.0),
                         mixer=sub.mixer)
    prog = player._ensure_program()
    assert prog.effect_batches, "sibling delay chains were not batched"
    for _ in range(6):  # tones end at block 4; feedback tail keeps ringing
        player.render_block()
    assert np.abs(player.render_block()).max() > 1e-4  # tail audible

    player.remove_mixer(subs[1].mixer)  # survivor becomes unbatched
    post = np.concatenate([player.render_block() for _ in range(3)], axis=-1)
    assert np.abs(post).max() > 1e-4, "surviving tail was frozen/bypassed"
