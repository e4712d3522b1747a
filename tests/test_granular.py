"""Granular engine tests: deterministic single-grain exactness + statistics."""

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from phonic_tpu import AudioFileBuffer, EngineConfig, Mixer, RenderProgram
from phonic_tpu.generators.granular import (
    CROSSFADE_POINTS, GranularConfig, grain_windows, window_sample,
)
from phonic_tpu.generators.sampler import AhdsrConfig, Sampler
from phonic_tpu.generators.base import GeneratorPlaybackOptions

SR = 48000


def ramp_buffer(frames=SR):
    # a linear ramp makes grain read positions directly observable
    x = np.linspace(0.0, 1.0, frames, dtype=np.float32)
    return AudioFileBuffer.from_array(x[None, :], SR)


def render(s, frames, block=4096):
    m = Mixer("main")
    m.add_source(s)
    prog = RenderProgram(m, EngineConfig(sample_rate=SR, block_frames=block))
    return prog.render(duration_frames=frames)


def test_window_luts_shapes():
    luts = np.asarray(grain_windows())
    assert luts.shape == (8, 2048)
    # Hann: 0 at edges, 1 at centre
    assert abs(luts[0, 0]) < 1e-6 and abs(luts[0, 1024] - 1.0) < 1e-3
    # Trapezoid sustains at 1 through the middle
    assert np.all(luts[4, 256:1792] == 1.0)
    # all windows within [0, 1]
    assert luts.min() >= -1e-6 and luts.max() <= 1.0 + 1e-6
    # lerp lookup matches LUT at exact grid points
    v = np.asarray(window_sample(jnp.zeros((4,), jnp.int32),
                                 jnp.asarray([0.0, 0.25, 0.5, 0.75])))
    expect = [luts[0, int(p * 2047)] for p in (0.0, 0.25, 0.5, 0.75)]
    np.testing.assert_allclose(v, expect, atol=3e-3)


def test_single_grain_is_windowed_buffer_read():
    # density 1 Hz + 50 ms grains => exactly one grain at note start
    buf = ramp_buffer()
    s = Sampler(buf).with_granular_playback(GranularConfig(
        size_ms=50.0, density_hz=1.0, position=0.5, window="Hann",
    ))
    s.note_on(60, volume=1.0, time=0)
    out = render(s, 8192)
    dur = int(50.0 * SR / 1000.0)
    # grain 1 plays [0, dur): windowed read from position 0.5 moving forward
    frames = buf.frames  # mono buffer has same length
    local = np.arange(dur)
    pos = 0.5 + local / frames
    expected_sig = pos  # ramp buffer: value == normalized position (approx)
    luts = np.asarray(grain_windows())
    wphase = local / dur
    env = np.interp(wphase * 2047, np.arange(2048), luts[0])
    expected = expected_sig * env  # centre pan: l = r = 0.5 * windowed
    got = out[0, :dur] + out[1, :dur]  # l+r = windowed sample
    err = np.abs(got - expected).max()
    assert err < 5e-3, err
    # silence between grains (density 1 Hz, next grain at 48000)
    assert np.abs(out[:, dur + 100:8192]).max() == 0.0


def test_grain_direction_backward():
    buf = ramp_buffer()
    s = Sampler(buf).with_granular_playback(GranularConfig(
        size_ms=50.0, density_hz=1.0, position=0.5, window="Trapezoid",
        direction="Backward",
    ))
    s.note_on(60, time=0)
    out = render(s, 4096)
    mid = out[0, 500:1900] + out[1, 500:1900]
    # ramp read backwards: decreasing values in the sustained window section
    assert np.all(np.diff(mid) < 0)


def test_density_controls_grain_count():
    buf = ramp_buffer()
    outs = {}
    for dens in (5.0, 40.0):
        s = Sampler(buf).with_granular_playback(GranularConfig(
            size_ms=10.0, density_hz=dens, position=0.25, window="Hann",
        ))
        s.note_on(60, time=0)
        out = render(s, SR // 2)
        mono = np.abs(out[0] + out[1])
        # count grain onsets: silence -> signal transitions
        active = (mono > 1e-4).astype(int)
        onsets = np.sum(np.diff(active) > 0)
        outs[dens] = onsets
    assert outs[40.0] > outs[5.0] * 4  # roughly proportional


def test_variation_produces_diverse_grains():
    buf = ramp_buffer()
    s = Sampler(buf).with_granular_playback(GranularConfig(
        size_ms=20.0, density_hz=30.0, position=0.5, variation=1.0,
        spray=0.5, pan_spread=1.0,
    ))
    s.note_on(60, time=0)
    out = render(s, SR // 2)
    # pan spread: left and right significantly decorrelated
    l, r = out[0, 1000:], out[1, 1000:]
    corr = np.corrcoef(l, r)[0, 1]
    assert corr < 0.95
    # reproducible: same seed -> identical render
    s2 = Sampler(buf).with_granular_playback(GranularConfig(
        size_ms=20.0, density_hz=30.0, position=0.5, variation=1.0,
        spray=0.5, pan_spread=1.0,
    ))
    s2.note_on(60, time=0)
    out2 = render(s2, SR // 2)
    np.testing.assert_array_equal(out, out2)


def test_sequential_mode_chains_grains():
    buf = ramp_buffer()
    s = Sampler(buf).with_granular_playback(GranularConfig(
        overlap_mode="Sequential", size_ms=30.0, density_hz=1.0,
        position=0.3, window="Hann",
    ))
    s.note_on(60, time=0)
    out = render(s, SR // 2)
    mono = np.abs(out[0] + out[1])
    # sequential chaining at the 0.5 crossfade point => continuous signal
    # (no long gaps), even though density would only give 1 grain
    dur = int(30.0 * SR / 1000.0)
    active_ratio = np.mean(mono[dur:] > 1e-5)
    assert active_ratio > 0.9, active_ratio


def test_modulation_lfo_to_position():
    buf = ramp_buffer()
    s = Sampler(buf).with_granular_playback(GranularConfig(
        size_ms=5.0, density_hz=100.0, position=0.5, window="Trapezoid",
    ))
    s.set_modulation("LFO1", "GPOS", 0.4, bipolar=True)
    s.note_on(60, time=0)
    out = render(s, SR)
    # position modulated +-0.4 around 0.5 -> grain read values (ramp) sweep
    mono = out[0] + out[1]
    vals = mono[np.abs(mono) > 1e-3]
    # modulated +-0.4 around 0.5: the ramp-buffer read peaks sweep high
    assert vals.max() > 0.75

    s2 = Sampler(buf).with_granular_playback(GranularConfig(
        size_ms=5.0, density_hz=100.0, position=0.5, window="Trapezoid",
    ))
    s2.note_on(60, time=0)
    out2 = render(s2, SR)
    mono2 = out2[0] + out2[1]
    vals2 = mono2[np.abs(mono2) > 1e-3]
    assert vals2.max() < 0.65  # unmodulated stays near position 0.5


def test_granular_respects_envelope_and_block_splits():
    buf = ramp_buffer()
    def make():
        s = Sampler(buf, envelope=AhdsrConfig(attack=0.05, release=0.1)) \
            .with_granular_playback(GranularConfig(size_ms=20.0, density_hz=50.0))
        nid = s.note_on(60, time=512)
        s.note_off(nid, time=20000)
        return s
    out_a = render(make(), 32768, block=4096)
    out_b = render(make(), 32768, block=2048)
    # trigger times may shift by one sample between partitions (f32 phase
    # state rounding); each shift moves one windowed sample edge
    np.testing.assert_allclose(out_a, out_b, atol=2e-3)
    assert np.abs(out_a[:, :512]).max() == 0.0
    assert np.abs(out_a[:, 30000:]).max() < 1e-3  # released + decayed


def test_runtime_loop_range_captures_grains():
    """SamplerMessage::SetLoopRange in granular mode (granular.rs:516):
    looping the silent half of the buffer starves the grains."""
    N = 2048
    CFG = EngineConfig(sample_rate=SR, channels=2, block_frames=N)
    frames = SR
    x = np.full(frames, 0.5, np.float32)
    x[frames // 5 : 3 * frames // 10] = 0.0  # silent 20%..30% region
    buf = AudioFileBuffer.from_array(x[None, :], SR)
    s = Sampler(buf).with_granular_playback(
        GranularConfig(size_ms=20.0, density_hz=60.0, position=0.0,
                       step=1.0, spray=0.0))
    s.note_on(60, volume=1.0, time=0)
    # from block 2: loop the silent region; the travelling playhead enters
    # it at ~0.2 s and is captured (loop-capture semantics)
    s.set_loop_range((frames // 5, 3 * frames // 10), time=2 * N)
    main = Mixer("main")
    main.add_source(s)
    prog = RenderProgram(main, CFG)
    out = np.asarray(prog.render(duration_frames=14 * N))
    loud = np.sqrt(np.mean(out[0, 2 * N : 4 * N] ** 2))
    quiet = np.sqrt(np.mean(out[0, 9 * N :] ** 2))
    assert loud > 0.05, loud
    assert quiet < loud * 0.05, (loud, quiet)


def test_rr_hoisted_read_matches_default(monkeypatch):
    """The hoisted Pallas ramp-read granular path (chunk scan outside the
    voice vmap, one fused read per chunk, circular-ext packing) must match
    the per-voice gather path, including loops, reverse grains, spray and
    a mid-render retrigger."""
    import phonic_tpu.generators.sampler as smod
    from phonic_tpu import GranularConfig
    from phonic_tpu.generators.base import GeneratorPlaybackOptions

    def make():
        rng = np.random.default_rng(7)
        x = rng.normal(size=9000).astype(np.float32) * 0.5
        buf = AudioFileBuffer.from_array(x[None, :], SR)
        s = Sampler(buf, GeneratorPlaybackOptions(voices=2)) \
            .with_granular_playback(GranularConfig(
                size_ms=40.0, density_hz=60.0, position=0.4, variation=0.6,
                spray=0.4, pan_spread=0.5, direction="Random"))
        s.set_loop_range((1000, 8000), time=0)
        s.note_on(60, volume=0.8, time=100)
        s.note_on(67, volume=0.6, time=3000)
        return s

    def run(force):
        monkeypatch.setattr(smod, "_FORCE_RR", force)
        # block > _GRANULAR_CHUNK exercises the chunk scan; the second
        # render call below covers the single-chunk path
        out = render(make(), 8192, block=4096)
        return np.asarray(out)

    a = run(False)
    b = run(True)
    # per-grain read rounding (Horner vs expanded tap weights, both exact
    # f32 Catmull-Rom, <= 2e-6 each: test_granular_mmread) accumulates
    # across ~dozens of overlapping grains in the mix
    np.testing.assert_allclose(a, b, atol=1e-4)
