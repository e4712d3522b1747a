"""Effect suite tests: each effect vs its per-sample NumPy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from phonic_tpu.graph.nodes import BuildCtx
from phonic_tpu.ops import filters as flt
from phonic_tpu.effects import pan as pan_fx
from phonic_tpu.effects import filter as filter_fx
from phonic_tpu.effects import eq5 as eq5_fx
from phonic_tpu.effects import distortion as dist_fx
from phonic_tpu.effects import gate as gate_fx

import reference_dsp as ref

SR = 48000
N = 4096
CTX = BuildCtx(sample_rate=SR, channels=2, block_frames=N, max_events=8)


def stereo_noise(n=N, seed=0, scale=0.5):
    rng = np.random.default_rng(seed)
    return (scale * rng.normal(size=(2, n))).astype(np.float32)


def const_params(node, extra=None):
    """Constant per-sample parameter arrays from the node's initials."""
    vals = node.param_initials()
    d = {pid: jnp.full((N,), np.float32(v)) for pid, v in vals.items()}
    d["_frame0"] = jnp.int32(0)
    if extra:
        for k, v in extra.items():
            d[k] = jnp.full((N,), np.float32(v))
    return d


def run_effect(node, x, extra=None, ctx=CTX):
    state = node.init_state(ctx)
    return node.process(state, jnp.asarray(x), const_params(node, extra), ctx)


# ---------------------------------------------------------------------------
# Panning
# ---------------------------------------------------------------------------


def test_panning_neutral_is_identity():
    x = stereo_noise()
    _, y = run_effect(pan_fx.PanningEffect(), x)
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-7)


def test_panning_width_and_invert():
    x = stereo_noise()
    # width 0 = mono: both channels equal mid
    _, y = run_effect(pan_fx.PanningEffect(width=0.0), x)
    mid = (x[0] + x[1]) * 0.5
    np.testing.assert_allclose(np.asarray(y[0]), mid, atol=1e-6)
    np.testing.assert_allclose(np.asarray(y[1]), mid, atol=1e-6)
    # invert L flips phase before width/pan
    _, y2 = run_effect(pan_fx.PanningEffect(invert_l=True), x)
    np.testing.assert_allclose(np.asarray(y2[0]), -x[0], atol=1e-6)
    # hard pan right kills left
    _, y3 = run_effect(pan_fx.PanningEffect(pan=1.0), x)
    np.testing.assert_allclose(np.asarray(y3[0]), 0.0, atol=1e-6)
    l, r = ref.panning_factors(1.0)
    np.testing.assert_allclose(np.asarray(y3[1]), x[1] * r, atol=1e-5)


# ---------------------------------------------------------------------------
# Filter
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("ft,rft", [
    ("Lowpass", flt.LOWPASS), ("Bandpass", flt.BANDPASS),
    ("Bandstop", flt.NOTCH), ("Highpass", flt.HIGHPASS),
])
def test_filter_effect_matches_tpt_oracle(ft, rft):
    x = stereo_noise()
    node = filter_fx.FilterEffect(filter_type=ft, cutoff=1200.0, q=1.1)
    _, y = run_effect(node, x)
    coefs = flt.biquad_coefficients(rft, SR, 1200.0, 1.1)
    np_coefs = [np.float64(np.asarray(c)) for c in coefs]
    for ch in range(2):
        expected, _ = ref.tpt_filter(x[ch], *np_coefs)
        assert ref.error_db(np.asarray(y[ch]), expected, ref_peak=1.0) < -90.0


# ---------------------------------------------------------------------------
# EQ5
# ---------------------------------------------------------------------------


def test_eq5_neutral_gains_are_transparent():
    x = stereo_noise()
    _, y = run_effect(eq5_fx.Eq5Effect(), x)
    # 0 dB everywhere: shelves/bells with unity gain are identity filters
    assert ref.error_db(np.asarray(y), x, ref_peak=1.0) < -100.0


def test_eq5_band_boost_matches_cascade_oracle():
    x = stereo_noise()
    gains = [3.0, -6.0, 12.0, 0.0, -3.0]
    node = eq5_fx.Eq5Effect(gains=gains)
    _, y = run_effect(node, x)

    expected = np.asarray(x, np.float64)
    types = (flt.LOWSHELF, flt.BELL, flt.BELL, flt.BELL, flt.HIGHSHELF)
    freqs = (100.0, 1000.0, 4000.0, 8000.0, 12000.0)
    bws = (1.0, 4.0, 4.0, 4.0, 1.0)
    for i in range(5):
        q = bws[i] if types[i] in (flt.LOWSHELF, flt.HIGHSHELF) else 1.0 / bws[i]
        coefs = flt.biquad_coefficients(types[i], SR, freqs[i], q, gains[i])
        np_coefs = [np.float64(np.asarray(c)) for c in coefs]
        out = np.empty_like(expected)
        for ch in range(2):
            out[ch], _ = ref.tpt_filter(expected[ch], *np_coefs)
        expected = out
    err = ref.error_db(np.asarray(y), expected, ref_peak=np.max(np.abs(expected)))
    assert err < -90.0, f"eq5 cascade err {err:.1f} dB"


# ---------------------------------------------------------------------------
# Distortion
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("dtype_name", ["SoftClip", "HardClip", "Diode", "Fuzz", "Fold"])
def test_distortion_shapers_match_reference(dtype_name):
    x = stereo_noise(scale=0.9)
    drive = 2.5
    node = dist_fx.DistortionEffect(distortion_type=dtype_name, drive=drive, mix=1.0)
    _, y = run_effect(node, x)

    shaper = ref.SHAPERS[dtype_name]
    luts = np.asarray(dist_fx.compensation_luts())
    t_idx = ["SoftClip", "HardClip", "Diode", "Fuzz", "Fold"].index(dtype_name)
    pos = drive / 4.0 * 255
    lo = int(pos)
    comp = luts[t_idx, lo] + (luts[t_idx, min(lo + 1, 255)] - luts[t_idx, lo]) * (pos - lo)
    expected = np.vectorize(lambda v: shaper(float(v), drive))(x) * comp
    err = ref.error_db(np.asarray(y), expected, ref_peak=max(np.max(np.abs(expected)), 1e-9))
    assert err < -90.0, f"{dtype_name}: {err:.1f} dB"


def test_distortion_mix_blends():
    x = stereo_noise()
    node0 = dist_fx.DistortionEffect("HardClip", drive=3.0, mix=0.0)
    _, y0 = run_effect(node0, x)
    np.testing.assert_allclose(np.asarray(y0), x, atol=1e-6)  # dry
    nodeh = dist_fx.DistortionEffect("HardClip", drive=3.0, mix=0.5)
    node1 = dist_fx.DistortionEffect("HardClip", drive=3.0, mix=1.0)
    _, yh = run_effect(nodeh, x)
    _, y1 = run_effect(node1, x)
    np.testing.assert_allclose(np.asarray(yh), 0.5 * x + 0.5 * np.asarray(y1), atol=1e-5)


# ---------------------------------------------------------------------------
# Gate
# ---------------------------------------------------------------------------


def test_gate_matches_reference_machine():
    rng = np.random.default_rng(5)
    n = 3 * SR // 10
    burst = np.zeros((2, n), np.float32)
    burst[:, 2000:6000] = rng.normal(size=(2, 4000)).astype(np.float32) * 0.5
    burst[:, 9000:10000] = 0.001  # below threshold
    node = gate_fx.GateEffect(threshold=-30.0, attack=0.005, hold=0.02, release=0.05)
    ctx = BuildCtx(SR, 2, n, 8)
    state = node.init_state(ctx)
    params = {pid: jnp.full((n,), np.float32(v)) for pid, v in node.param_initials().items()}
    params["_frame0"] = jnp.int32(0)
    _, y = node.process(state, jnp.asarray(burst), params, ctx)

    gains = ref.gate_gains(burst, SR, -30.0, 0.005, 0.02, 0.05, -60.0)
    expected = burst * gains[None, :]
    err = ref.error_db(np.asarray(y), expected, ref_peak=0.5)
    assert err < -90.0, f"gate err {err:.1f} dB"
    # gate actually closes in silence
    assert np.max(np.abs(np.asarray(y)[:, n - 1000:])) < 1e-4


def test_gate_tail():
    node = gate_fx.GateEffect(hold=0.02, release=0.05)
    assert node.tail_frames(CTX) == int(0.07 * SR) + 1


# ---------------------------------------------------------------------------
# Compressor / limiter
# ---------------------------------------------------------------------------

from phonic_tpu.effects import compressor as comp_fx


def _run_compressor(node, x, n):
    ctx = BuildCtx(SR, 2, n, 8)
    state = node.init_state(ctx)
    params = {pid: jnp.full((n,), np.float32(v)) for pid, v in node.param_initials().items()}
    params["_frame0"] = jnp.int32(0)
    return node.process(state, jnp.asarray(x), params, ctx)


def test_compressor_matches_reference():
    rng = np.random.default_rng(9)
    n = SR // 4
    x = np.zeros((2, n), np.float32)
    x[:, 1000:6000] = (rng.normal(size=(2, 5000)) * 0.8).astype(np.float32)
    x[:, 8000:9000] = 0.05
    node = comp_fx.CompressorEffect(threshold=-12.0, ratio=4.0, knee=3.0,
                                    attack=0.01, release=0.2, makeup_gain=3.0,
                                    lookahead=0.01)
    _, y = _run_compressor(node, x, n)
    expected = ref.compressor(x, SR, -12.0, 4.0, 3.0, 0.01, 0.2, 3.0, 0.01)
    err = ref.error_db(np.asarray(y), expected, ref_peak=np.max(np.abs(expected)))
    assert err < -90.0, f"compressor err {err:.1f} dB"


def test_limiter_mode_with_lookahead():
    rng = np.random.default_rng(11)
    n = SR // 4
    x = (rng.normal(size=(2, n)) * 0.1).astype(np.float32)
    x[:, 5000:5100] = 1.5  # a hot transient
    node = comp_fx.CompressorEffect.limiter(attack=0.005, release=0.1)
    _, y = _run_compressor(node, x, n)
    expected = ref.compressor(x, SR, comp_fx.DEFAULT_LIMITER_THRESHOLD, 20.0, 0.0,
                              0.005, 0.1, 0.0, 0.005)
    err = ref.error_db(np.asarray(y), expected, ref_peak=np.max(np.abs(expected)))
    assert err < -90.0, f"limiter err {err:.1f} dB"
    # gain reduction engaged (the reference limiter does overshoot on square
    # transients shorter than its attack — we match that behaviour exactly)
    assert np.max(np.abs(np.asarray(y)[:, 5050:5100])) < 0.4


def test_compressor_state_carry_across_blocks():
    rng = np.random.default_rng(13)
    n = 8192
    x = (rng.normal(size=(2, 2 * n)) * 0.7).astype(np.float32)
    node = comp_fx.CompressorEffect()
    ctx = BuildCtx(SR, 2, n, 8)
    params = {pid: jnp.full((n,), np.float32(v)) for pid, v in node.param_initials().items()}
    params["_frame0"] = jnp.int32(0)
    state = node.init_state(ctx)
    state, y1 = node.process(state, jnp.asarray(x[:, :n]), params, ctx)
    state, y2 = node.process(state, jnp.asarray(x[:, n:]), params, ctx)
    whole_ctx = BuildCtx(SR, 2, 2 * n, 8)
    params2 = {pid: jnp.full((2 * n,), np.float32(v)) for pid, v in node.param_initials().items()}
    params2["_frame0"] = jnp.int32(0)
    _, yw = node.process(node.init_state(whole_ctx), jnp.asarray(x), params2, whole_ctx)
    got = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=1)
    np.testing.assert_allclose(got, np.asarray(yw), atol=2e-5)
