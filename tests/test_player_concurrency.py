"""Control-plane vs render-pump concurrency (the race-detection analog of
SURVEY §5: the reference's discipline is lock-free single-writer queues;
here a control lock serializes mutations against the block step).

A background pump renders continuously while the main thread hammers
topology edits, parameter automation, notes, messages and seeks — the run
must complete without exceptions and keep producing finite audio."""

import threading
import time

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from phonic_tpu import AudioFileBuffer, FilePlaybackOptions
from phonic_tpu.effects.filter import FilterEffect
from phonic_tpu.effects.gain import GainEffect
from phonic_tpu.generators.sampler import AhdsrConfig, Sampler
from phonic_tpu.generators.base import GeneratorPlaybackOptions
from phonic_tpu.outputs.null import NullOutput
from phonic_tpu.player import Player, PlayerConfig

SR = 48000


def tone(frames=24000, freq=220.0):
    t = np.arange(frames) / SR
    return AudioFileBuffer.from_array(
        (0.4 * np.sin(2 * np.pi * freq * t)).astype(np.float32)[None, :], SR)


def test_concurrent_control_while_pumping():
    player = Player(NullOutput(SR, 2), PlayerConfig(block_frames=1024))
    h_file = player.play_file(tone(), FilePlaybackOptions(repeat=None,
                                                          fade_out_secs=0.0))
    sampler = Sampler(tone(freq=330.0), GeneratorPlaybackOptions(voices=4),
                      envelope=AhdsrConfig(release=0.1))
    h_gen = player.play_generator(sampler)

    errors = []
    rendered = []
    stop = threading.Event()

    def pump():
        try:
            while not stop.is_set():
                audio = player.render_block()
                assert np.isfinite(audio).all()
                rendered.append(np.abs(audio).max())
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    th = threading.Thread(target=pump, daemon=True)
    th.start()

    rng = np.random.default_rng(0)
    note_ids = []
    try:
        # two topology edits mid-pump (each forces a recompile + state
        # adoption under concurrent stepping), surrounded by dense
        # parameter / note / seek churn
        for k in range(60):
            op = k % 5
            if op == 0:
                h_file.set_volume(float(rng.uniform(0.2, 1.0)))
            elif op == 1:
                h_file.set_speed(float(rng.uniform(0.5, 2.0)),
                                 glide=float(rng.uniform(0, 30)) or None)
            elif op == 2:
                nid = h_gen.note_on(int(rng.integers(40, 80)),
                                    volume=float(rng.uniform(0.3, 0.9)))
                note_ids.append(nid)
                if len(note_ids) > 2:
                    h_gen.note_off(note_ids.pop(0))
            elif op == 3 and k in (3, 33):
                m = player.add_mixer()
                m.add_effect(FilterEffect(cutoff=float(rng.uniform(500, 8000))))
                player.add_effect(GainEffect(gain=0.8), mixer=m.mixer)
            else:
                h_file.seek(float(rng.uniform(0, 20000)))
            time.sleep(0.01)
    finally:
        stop.set()
        th.join(timeout=120)

    assert not errors, errors[:1]
    assert len(rendered) > 3, "pump starved"
    assert player.position > 0
