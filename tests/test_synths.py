"""SynthDef protocol: one-shot synth source + polyphonic synth generator."""

import numpy as np
import jax.numpy as jnp

from phonic_tpu import EngineConfig, Mixer, RenderProgram
from phonic_tpu.sources.synth import SynthDef, SynthPlaybackOptions, SynthSource, SynthContext
from phonic_tpu.generators.synth import SynthGenerator
from phonic_tpu.generators.base import GeneratorPlaybackOptions
from phonic_tpu import synths

SR = 48000


def render_src(src, frames, block=4096):
    m = Mixer("main")
    m.add_source(src)
    return RenderProgram(m, EngineConfig(sample_rate=SR, block_frames=block)).render(
        duration_frames=frames)


def dominant_freq(sig):
    w = np.abs(np.fft.rfft(sig * np.hanning(len(sig))))
    return np.argmax(w) * SR / len(sig)


def test_synth_source_plays_tone():
    src = SynthSource(synths.organ(), SynthPlaybackOptions(
        frequency=440.0, duration=20000, volume=0.8))
    out = render_src(src, 24576)
    seg = out[0, 4096:16384]
    assert abs(dominant_freq(seg) - 440.0) < 10.0
    # fades to silence after the gate closes + release
    assert np.abs(out[:, 24000:]).max() < 1e-2


def test_synth_source_duration_and_natural_end():
    src = SynthSource(synths.organ(), SynthPlaybackOptions(duration=9600))
    m = Mixer("main")
    m.add_source(src)
    prog = RenderProgram(m, EngineConfig(sample_rate=SR, block_frames=2048))
    dur = prog.natural_duration_frames()
    assert dur is not None and 9600 < dur < 16000


def test_synth_generator_polyphony_and_pitch():
    gen = SynthGenerator(synths.sub3(), GeneratorPlaybackOptions(voices=4),
                         release_secs=0.15)
    a = gen.note_on(69, time=0)       # A4 = 440
    b = gen.note_on(76, time=0)       # E5 ~ 659
    gen.note_off(a, time=20000)
    gen.note_off(b, time=20000)
    out = render_src(gen, 32768)
    seg = out[0, 4096:16384]
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    freqs = np.arange(len(spec)) * SR / len(seg)
    def peak_near(f):
        band = spec[(freqs > f - 15) & (freqs < f + 15)]
        return band.max() if len(band) else 0.0
    assert peak_near(440.0) > 0.05 * spec.max() or peak_near(440) > peak_near(2000)
    assert peak_near(659.3) > 0.0
    # decays after release
    assert np.abs(out[:, 30000:]).max() < 5e-2


def test_dx7_velocity_affects_brightness():
    def render_vel(v):
        gen = SynthGenerator(synths.dx7(), GeneratorPlaybackOptions(voices=2))
        nid = gen.note_on(60, volume=v, time=0)
        gen.note_off(nid, time=12000)
        return render_src(gen, 16384)
    soft = render_vel(0.2)
    loud = render_vel(1.0)
    def hf_ratio(sig):
        seg = sig / max(np.abs(sig).max(), 1e-9)
        w = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
        f = np.arange(len(w)) * SR / len(seg)
        return w[f > 1000].sum() / w.sum()
    # FM index scales with velocity -> more sideband (HF) energy when loud
    assert hf_ratio(loud[0, 2048:8192]) > 3 * hf_ratio(soft[0, 2048:8192])


def test_custom_synthdef_protocol():
    # user-defined: plain white-noise burst via counter hashing
    from phonic_tpu.ops.lfo import _hash_random

    def init(ctx):
        return {}

    def render(state, ctx: SynthContext):
        noise = _hash_random(7, ctx.age) * (ctx.gate > 0.0)
        return state, noise * 0.5

    src = SynthSource(SynthDef(init=init, render=render),
                      SynthPlaybackOptions(duration=4096))
    out = render_src(src, 8192)
    assert np.abs(out[:, :4096]).max() > 0.2
    assert np.abs(out[:, 7000:]).max() < 1e-3
