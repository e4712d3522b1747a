"""Randomized end-to-end Player session fuzz.

Drives the full control vocabulary (play/stop/kill/seek/speed-glide/volume/
panning, note on/off, effect add/move/remove + parameter automation, mixer
add/remove, transient auto-retirement) in random interleavings against a
live Player, checking global invariants the reference engine guarantees
structurally (src/source/mixed.rs message loop + src/player.rs GC):

* every rendered block is finite (the NaN guard must never trip),
* the node count stays bounded under play/stop churn (auto-retirement),
* control on removed/finished playbacks either no-ops or raises
  NotFoundError — never corrupts unrelated playback or the engine,
* the session stays renderable and inspectable (cpu_load / audio_level /
  tree dump) after every interleaving.

A per-op log is attached to failures so any seed reproduces directly.
"""

import numpy as np
import pytest

from phonic_tpu import (AhdsrConfig, AudioFileBuffer, GeneratorPlaybackOptions,
                        Player, PlayerConfig, Sampler)
from phonic_tpu.effects.filter import FilterEffect
from phonic_tpu.effects.gain import GainEffect
from phonic_tpu.errors import NotFoundError, PhonicError
from phonic_tpu.outputs.null import NullOutput
from phonic_tpu.sources.file import FilePlaybackOptions

SR = 48000
BLOCK = 256


def tone_buffer(frames, freq=440.0, amp=0.4):
    t = np.arange(frames) / SR
    x = (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    return AudioFileBuffer.from_array(x[None, :], SR)


class Session:
    """Op vocabulary over a live Player; each op validates its own
    contract and appends to a replay log."""

    # every topology edit is a retrace (~seconds on CPU); the budget keeps
    # the fuzz wall-clock bounded while control ops stay unlimited (they
    # lower to tensors, never recompile)
    MAX_TOPOLOGY_EDITS = 9

    def __init__(self, seed):
        self.rng = np.random.default_rng(seed)
        self.player = Player(
            NullOutput(SR, 2),
            PlayerConfig(block_frames=BLOCK, retire_after_dead_sources=3))
        self.handles = []       # live-ish PlaybackHandles
        self.gen = None         # one Sampler generator handle
        self.notes = []         # live note ids
        self.effects = []       # (effect, mixer) added dynamically
        self.sub = None         # one dynamic sub-mixer handle
        self.log = []
        self.topology_edits = 0

    def _topology_allowed(self):
        return self.topology_edits < self.MAX_TOPOLOGY_EDITS

    # -- op implementations -------------------------------------------
    def op_play(self):
        frames = int(self.rng.integers(2 * BLOCK, 30 * BLOCK))
        opts = FilePlaybackOptions(
            volume=float(self.rng.uniform(0.1, 0.9)),
            panning=float(self.rng.uniform(-1.0, 1.0)),
            speed=float(self.rng.uniform(0.5, 2.0)),
            repeat=int(self.rng.integers(0, 2)),
            fade_out_secs=float(self.rng.choice([0.0, 0.01])),
        )
        mixer = self.sub.mixer if (self.sub and self.rng.random() < 0.3) else None
        h = self.player.play_file(
            tone_buffer(frames, freq=float(self.rng.uniform(80, 1000))),
            opts, mixer=mixer)
        self.handles.append(h)
        self.topology_edits += 1

    def op_handle_control(self):
        if not self.handles:
            return
        h = self.handles[int(self.rng.integers(len(self.handles)))]
        kind = self.rng.choice(["volume", "panning", "speed", "seek",
                                "stop", "kill"])
        at = (None if self.rng.random() < 0.5
              else self.player.position + int(self.rng.integers(0, 4 * BLOCK)))
        try:
            if kind == "volume":
                h.set_volume(float(self.rng.uniform(0.0, 1.0)), at=at)
            elif kind == "panning":
                h.set_panning(float(self.rng.uniform(-1.0, 1.0)), at=at)
            elif kind == "speed":
                glide = (None if self.rng.random() < 0.5
                         else float(self.rng.uniform(1.0, 60.0)))
                h.set_speed(float(self.rng.uniform(0.5, 2.0)), glide=glide,
                            at=at)
            elif kind == "seek":
                h.seek(float(self.rng.uniform(0, 10 * BLOCK)), at=at)
            elif kind == "stop":
                h.stop(at=at)
            else:
                h.kill(at=at)
                self.handles.remove(h)
        except NotFoundError:
            # already retired/removed: legal, must not affect others
            if h in self.handles:
                self.handles.remove(h)

    def op_notes(self):
        if self.gen is None:
            s = Sampler(tone_buffer(6 * BLOCK),
                        GeneratorPlaybackOptions(voices=4),
                        envelope=AhdsrConfig(attack=0.002, release=0.05))
            self.gen = self.player.play_generator(s)
            self.topology_edits += 1
            return
        if self.notes and self.rng.random() < 0.4:
            nid = self.notes.pop(int(self.rng.integers(len(self.notes))))
            self.gen.note_off(nid)
        else:
            nid = self.gen.note_on(int(self.rng.integers(40, 80)),
                                   float(self.rng.uniform(0.2, 1.0)))
            self.notes.append(nid)

    def op_effects(self):
        roll = self.rng.random()
        if roll < 0.5 or not self.effects:
            eff = (GainEffect(gain=float(self.rng.uniform(0.3, 1.2)))
                   if self.rng.random() < 0.5 else
                   FilterEffect(cutoff=float(self.rng.uniform(200, 12000))))
            mixer = (self.sub.mixer
                     if (self.sub and self.rng.random() < 0.4) else None)
            handle = self.player.add_effect(eff, mixer=mixer)
            self.effects.append((eff, mixer, handle))
            self.topology_edits += 1
        elif roll < 0.8:
            eff, mixer, handle = self.effects[
                int(self.rng.integers(len(self.effects)))]
            p = next(p for p in eff.PARAMS if hasattr(p, "min"))
            try:
                handle.set_parameter(p.id, float(self.rng.uniform(p.min, p.max)))
            except NotFoundError:
                pass  # effect's mixer was removed with the subtree
        else:
            eff, mixer, _ = self.effects.pop(
                int(self.rng.integers(len(self.effects))))
            try:
                self.player.remove_effect(eff, mixer=mixer)
                self.topology_edits += 1
            except (NotFoundError, ValueError):
                pass  # its mixer was removed with the subtree

    def op_mixers(self):
        if self.sub is None:
            self.sub = self.player.add_mixer()
            self.topology_edits += 1
        elif self.rng.random() < 0.25:
            self.player.remove_mixer(self.sub)
            # handles routed into the subtree are now gone
            self.handles = [h for h in self.handles if h.is_playing()]
            self.effects = [(e, m, hd) for (e, m, hd) in self.effects
                            if m is not self.sub.mixer]
            self.sub = None
            self.topology_edits += 1

    def render(self, blocks=1):
        for _ in range(blocks):
            audio = self.player.render_block()
            assert np.all(np.isfinite(audio)), "NaN guard must never trip"

    def step(self):
        op = self.rng.choice(
            ["play", "control", "control", "notes", "effects", "mixers"],
            p=[0.18, 0.2, 0.2, 0.18, 0.14, 0.1])
        if op in ("play", "effects", "mixers") and not self._topology_allowed():
            op = "control"
        self.log.append(op)
        getattr(self, f"op_{op.replace('control', 'handle_control')}")()
        self.render(blocks=int(self.rng.integers(1, 3)))


@pytest.mark.slow
@pytest.mark.parametrize("seed", [0, 1])
def test_session_fuzz(seed):
    s = Session(seed)
    try:
        for _ in range(30):
            s.step()
        # session must stay bounded and alive
        nodes = sum(1 for _ in s.player.main_mixer.walk())
        assert nodes < 80, f"node count unbounded: {nodes}"
        s.render(blocks=4)
        assert np.isfinite(s.player.cpu_load().average)
        lvl = s.player.audio_level()
        assert lvl.peak_db().shape == (2,)
        assert str(s.player)  # tree dump renders
    except (AssertionError, PhonicError):
        raise
    except Exception as e:  # attach the replay log to unexpected failures
        raise AssertionError(
            f"seed={seed} unexpected {type(e).__name__}: {e}\nops={s.log}"
        ) from e
