"""Cross-generator voice batching: homogeneous Samplers render as ONE
vmapped pool (graph/batching.SamplerBatch) and must match the unbatched
path exactly, including across topology rebuilds (adopt)."""

import numpy as np
import pytest

from phonic_tpu import (AudioFileBuffer, EngineConfig, Mixer, RenderProgram,
                        AhdsrConfig, Sampler)
from phonic_tpu.generators.base import GeneratorPlaybackOptions

SR = 48000
CFG = dict(sample_rate=SR, channels=2, block_frames=2048,
           max_events_per_block=8)


def tone_buffer(frames, freq=440.0):
    t = np.arange(frames) / SR
    x = (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    return AudioFileBuffer.from_array(x[None, :], SR)


def make_samplers():
    """Three batchable samplers with DIFFERENT buffer lengths + schedules,
    plus one odd one out (different voice count) that must stay unbatched."""
    rng = np.random.default_rng(5)
    samplers = []
    for k, frames in enumerate([30000, 41000, 23017]):
        s = Sampler(tone_buffer(frames, 220.0 * (k + 1)),
                    GeneratorPlaybackOptions(voices=4),
                    envelope=AhdsrConfig(attack=0.01, decay=0.2, sustain=0.7,
                                         release=0.15))
        for j in range(6):
            t = int(rng.integers(0, 20000))
            nid = s.note_on(int(rng.integers(48, 72)),
                            float(rng.uniform(0.3, 1.0)), time=t)
            s.note_off(nid, time=t + int(rng.integers(2000, 15000)))
        samplers.append(s)
    odd = Sampler(tone_buffer(26000, 330.0),
                  GeneratorPlaybackOptions(voices=2),
                  envelope=AhdsrConfig(release=0.1))
    odd.note_on(60, 0.8, time=100)
    samplers.append(odd)
    return samplers


def render(batch_sources):
    m = Mixer("main")
    for s in make_samplers():
        m.add_source(s)
    prog = RenderProgram(m, EngineConfig(batch_sources=batch_sources, **CFG))
    if batch_sources:
        assert len(prog.gen_batches) == 1
        assert len(prog.gen_batches[0].paths) == 3
    return prog.render(duration_frames=32768)


def test_batched_matches_unbatched():
    batched = render(True)
    plain = render(False)
    np.testing.assert_allclose(batched, plain, atol=2e-6,
                               err_msg="sampler batch diverged from scalar path")


def test_batch_survives_topology_rebuild():
    """Mid-flight rebuild (a 4th matching sampler joins): carried voice
    positions keep the first blocks' tail bit-consistent with an
    uninterrupted render."""
    def build(extra):
        m = Mixer("main")
        samplers = make_samplers()[:3]
        for s in samplers:
            m.add_source(s)
        if extra is not None:
            m.add_source(extra)
        return m, samplers

    # control: uninterrupted
    m, _ = build(None)
    prog = RenderProgram(m, EngineConfig(**CFG))
    control = prog.render(duration_frames=16 * 2048)

    # rebuild after 4 blocks with a new batchable sampler (silent) added
    m, samplers = build(None)
    prog1 = RenderProgram(m, EngineConfig(**CFG))
    st = prog1.init_state()
    out1 = []
    for b in range(4):
        st, y = prog1.step_packed(st, prog1.packed_block_inputs(b))
        out1.append(np.asarray(y))
    joiner = Sampler(tone_buffer(5000), GeneratorPlaybackOptions(voices=4),
                     envelope=AhdsrConfig(attack=0.01, decay=0.2, sustain=0.7,
                                          release=0.15))
    m.add_source(joiner)  # no notes: silent, but changes the batch grouping
    prog2 = RenderProgram(m, EngineConfig(**CFG))
    st2 = prog2.adopt(prog1, st)
    for b in range(4, 16):
        st2, y = prog2.step_packed(st2, prog2.packed_block_inputs(b))
        out1.append(np.asarray(y))
    got = np.concatenate(out1, axis=-1)
    np.testing.assert_allclose(got, control, atol=2e-6,
                               err_msg="voice positions lost across rebuild")
