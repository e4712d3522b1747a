"""Cross-generator voice batching: homogeneous Samplers render as ONE
vmapped pool (graph/batching.LeafBatch) and must match the unbatched
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


def _simple_def():
    import jax.numpy as jnp
    from phonic_tpu.sources.synth import SynthDef

    def init(ctx):
        return {"phase": jnp.zeros((), jnp.float32)}

    def render(state, sctx):
        # stateful phase accumulator: batching must carry it per lane
        steps = sctx.freq / sctx.sample_rate
        ph = state["phase"] + jnp.cumsum(steps)
        audio = jnp.sin(2 * np.pi * ph) * sctx.gate * sctx.velocity
        return {"phase": ph[-1] % 1.0}, audio

    return SynthDef(init=init, render=render, channels=1)


def test_synth_sources_batch_and_match():
    """Homogeneous SynthSources (same SynthDef) render as one vmapped bank;
    per-lane frequency/start/duration ride as traced statics."""
    from phonic_tpu.sources.synth import SynthPlaybackOptions, SynthSource

    sd = _simple_def()

    def build():
        m = Mixer("main")
        for k, (freq, start, dur) in enumerate(
                [(220.0, 0, 20000), (330.0, 5000, 12000), (441.0, 9000, None)]):
            m.add_source(SynthSource(sd, SynthPlaybackOptions(
                frequency=freq, start_time=start, duration=dur,
                volume=0.4, panning=0.3 * (k - 1))))
        return m

    outs = {}
    for batch in (False, True):
        prog = RenderProgram(build(), EngineConfig(batch_sources=batch, **CFG))
        if batch:
            assert len(prog.gen_batches) == 1
            assert len(prog.gen_batches[0].paths) == 3
        outs[batch] = prog.render(duration_frames=16 * 2048)
    np.testing.assert_allclose(outs[True], outs[False], atol=2e-6,
                               err_msg="synth batch diverged from scalar path")


def test_streamed_sources_batch_and_match():
    """Homogeneous StreamedFileSources batch: the per-block decode windows
    stack in the lowered extras, start times ride as traced statics."""
    from phonic_tpu import FilePlaybackOptions
    from phonic_tpu.sources.streamed import StreamedFileSource

    def build():
        m = Mixer("main")
        for k, (frames, freq, start) in enumerate(
                [(30000, 220.0, 0), (41000, 300.0, 4000), (23017, 390.0, 9000)]):
            src = StreamedFileSource(
                tone_buffer(frames, freq),
                FilePlaybackOptions(volume=0.5, panning=0.2 * (k - 1),
                                    speed=0.8 + 0.2 * k, start_time=start,
                                    repeat=0),
                speed_cap=2.0)
            m.add_source(src)
        return m

    outs = {}
    for batch in (False, True):
        prog = RenderProgram(build(), EngineConfig(batch_sources=batch, **CFG))
        if batch:
            assert len(prog.gen_batches) == 1
            assert len(prog.gen_batches[0].paths) == 3
        outs[batch] = prog.render(duration_frames=16 * 2048)
    np.testing.assert_allclose(outs[True], outs[False], atol=2e-6,
                               err_msg="streamed batch diverged from scalar path")
