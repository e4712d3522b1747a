import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from phonic_tpu.graph.nodes import BuildCtx
from phonic_tpu.effects import chorus as chorus_fx
from phonic_tpu.effects import reverb as reverb_fx

import reference_dsp as ref

SR = 48000


def smooth_input(n, seed=3):
    t = np.arange(n) / SR
    rng = np.random.default_rng(seed)
    x = np.stack([
        0.4 * np.sin(2 * np.pi * 220 * t) * np.exp(-t * 3),
        0.4 * np.sin(2 * np.pi * 330 * t + 0.5) * np.exp(-t * 3),
    ]).astype(np.float32)
    x[:, : n // 8] += (0.05 * rng.normal(size=(2, n // 8))).astype(np.float32)
    return x


def run_node(node, x, n, block=4096):
    ctx = BuildCtx(SR, 2, block, 8)
    state = node.init_state(ctx)
    outs = []
    for t0 in range(0, n, block):
        params = {
            pid: jnp.full((block,), np.float32(v))
            for pid, v in node.param_initials().items()
        }
        params["_frame0"] = jnp.int32(t0)
        state, y = node.process(state, jnp.asarray(x[:, t0:t0 + block]), params, ctx)
        outs.append(np.asarray(y))
    return np.concatenate(outs, axis=1)


def test_chorus_matches_oracle():
    n = 6 * 4096
    x = smooth_input(n)
    node = chorus_fx.ChorusEffect(rate=1.5, depth=0.4, feedback=0.4,
                                  delay_ms=15.0, wet=0.6, filter_freq=8000.0,
                                  filter_resonance=0.2)
    got = run_node(node, x, n)
    b = node._subblock(BuildCtx(SR, 2, 4096, 8))
    expected = ref.chorus(x, SR, 1.5, np.pi / 2, 0.4, 0.4, 15.0, 0.6,
                          8000.0, 0.2, min_pos_samples=b + 1)
    err = ref.error_db(got, expected, ref_peak=np.max(np.abs(expected)))
    assert err < -90.0, f"chorus err {err:.1f} dB"


def test_chorus_dry_when_wet_zero():
    n = 2 * 4096
    x = smooth_input(n)
    node = chorus_fx.ChorusEffect(wet=0.0)
    got = run_node(node, x, n)
    np.testing.assert_allclose(got, x, atol=1e-6)


def test_reverb_matches_oracle_no_vibrato():
    # With vibrato frozen the whole structure (predelay, biquads, sin/asin,
    # allpasses, FDN + Householder feedback) must match the f64 oracle
    # exactly.  With vibrato on, the reference's `blend*val1` term is
    # discontinuous in the read position, so f32-vs-f64 phase differences
    # diverge chaotically — that path is validated statistically below.
    n = 6 * 4096
    x = smooth_input(n)
    node = reverb_fx.ReverbEffect(room_size=0.6, wet=0.5)
    old_depth, old_depths = reverb_fx.VIB_DEPTH, reverb_fx._VIB_DEPTHS
    try:
        reverb_fx.VIB_DEPTH = 0.0
        reverb_fx._VIB_DEPTHS = np.zeros(8)
        got = run_node(node, x, n)
    finally:
        reverb_fx.VIB_DEPTH = old_depth
        reverb_fx._VIB_DEPTHS = old_depths
    ctx = BuildCtx(SR, 2, 4096, 8)
    vib = np.asarray(node.init_state(ctx)["vib_phase"])
    expected = ref.reverb(x, SR, 0.6, 0.5, vib, vib_depth=0.0, line_depth=0.0)
    err = ref.error_db(got, expected, ref_peak=np.max(np.abs(expected)))
    assert err < -90.0, f"reverb err {err:.1f} dB"


def test_reverb_with_vibrato_statistical():
    # windowed RMS envelopes must agree within 1 dB even though per-sample
    # values diverge chaotically (see above)
    n = 6 * 4096
    x = smooth_input(n)
    node = reverb_fx.ReverbEffect(room_size=0.6, wet=0.5)
    got = run_node(node, x, n)
    ctx = BuildCtx(SR, 2, 4096, 8)
    vib = np.asarray(node.init_state(ctx)["vib_phase"])
    expected = ref.reverb(x, SR, 0.6, 0.5, vib)
    w = 2048
    for t0 in range(0, n - w, w):
        g = np.sqrt(np.mean(got[:, t0:t0 + w] ** 2))
        e = np.sqrt(np.mean(expected[:, t0:t0 + w] ** 2))
        if e > 1e-5:
            ratio_db = 20 * np.log10(g / e)
            assert abs(ratio_db) < 1.0, f"window {t0}: {ratio_db:.2f} dB"


def test_reverb_rings_out():
    # impulse -> long tail that decays
    n = 10 * 4096
    x = np.zeros((2, n), np.float32)
    x[:, 100] = 0.8
    node = reverb_fx.ReverbEffect(room_size=0.7, wet=1.0)
    got = run_node(node, x, n)
    early = np.abs(got[:, 2000:12000]).max()
    late = np.abs(got[:, n - 4096:]).max()
    assert early > 1e-3
    assert 0 < late < early  # decaying but still ringing
    assert node.tail_frames(BuildCtx(SR, 2, 4096, 8)) > 48000


def test_reverb_reset_flushes_tail():
    """ReverbEffectMessage::Reset (reverb.rs:470-494): a scheduled reset
    silences the ringing tail at the next block boundary."""
    from phonic_tpu import (AudioFileBuffer, EngineConfig, FilePlaybackOptions,
                            FileSource, Mixer, RenderProgram)
    from phonic_tpu.effects.reverb import ReverbEffect

    n = 2048
    cfg = EngineConfig(sample_rate=SR, channels=2, block_frames=n,
                       batch_sources=False)
    frames = SR // 2
    t = np.arange(frames) / SR
    x = (0.5 * np.sin(2 * np.pi * 220.0 * t) * np.exp(-t * 30)).astype(np.float32)
    buf = AudioFileBuffer.from_array(np.stack([x, x]), SR)
    main = Mixer("main")
    main.add_source(FileSource(buf, FilePlaybackOptions(fade_out_secs=0.0)))
    rev = ReverbEffect(room_size=0.8, wet=1.0)
    main.add_effect(rev)
    rev.reset(time=8 * n)
    prog = RenderProgram(main, cfg)
    out = np.asarray(prog.render(duration_frames=12 * n, mode="loop"))
    ringing = np.sqrt(np.mean(out[0, 6 * n : 8 * n] ** 2))
    after = np.sqrt(np.mean(out[0, 8 * n : 9 * n] ** 2))
    assert ringing > 1e-4, ringing
    assert after < ringing * 0.02, (ringing, after)


def test_reverb_min_room_hint_subblock_invariance():
    """min_room_size raises the feedback sub-block sizes (reverb._subblocks);
    the rendered audio must not depend on the sub-block split."""
    import pytest
    from phonic_tpu import (AudioFileBuffer, EngineConfig, FilePlaybackOptions,
                            FileSource, Mixer, RenderProgram)
    from phonic_tpu.effects.reverb import ReverbEffect

    with pytest.raises(ValueError):
        ReverbEffect(room_size=0.4, min_room_size=0.5)  # floor above value

    n = 4096
    cfg = EngineConfig(sample_rate=SR, channels=2, block_frames=n,
                       batch_sources=False)
    frames = SR // 4
    t = np.arange(frames) / SR
    x = (0.5 * np.sin(2 * np.pi * 330.0 * t) * np.exp(-t * 20)).astype(np.float32)
    buf = AudioFileBuffer.from_array(np.stack([x, x]), SR)

    outs = {}
    for tag, kw in {"default": {}, "hinted": {"min_room_size": 0.55}}.items():
        main = Mixer("main")
        main.add_source(FileSource(buf, FilePlaybackOptions(fade_out_secs=0.0)))
        main.add_effect(ReverbEffect(room_size=0.6, wet=0.5, **kw))
        prog = RenderProgram(main, cfg)
        outs[tag] = np.asarray(prog.render(duration_frames=4 * n, mode="loop"))
    a, b = outs["default"], outs["hinted"]
    sub_d = ReverbEffect(room_size=0.6)._subblocks(cfg)
    sub_h = ReverbEffect(room_size=0.6, min_room_size=0.55)._subblocks(cfg)
    assert sub_h[1] > sub_d[1], (sub_d, sub_h)  # the hint actually bites
    np.testing.assert_allclose(a, b, rtol=0, atol=2e-6)
