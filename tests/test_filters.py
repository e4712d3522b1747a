import numpy as np
import jax.numpy as jnp
import pytest

from phonic_tpu.ops import filters

import reference_dsp as ref

SR = 48000
N = 8192


def chirp(n, f0=30.0, f1=18000.0):
    t = np.arange(n) / SR
    k = (f1 - f0) / (n / SR)
    return np.sin(2 * np.pi * (f0 * t + 0.5 * k * t * t)).astype(np.float32)


@pytest.mark.parametrize("ftype", filters.BIQUAD_TYPES)
def test_biquad_types_match_oracle(ftype):
    x = chirp(N)
    coefs = filters.biquad_coefficients(ftype, SR, 1000.0, 0.9, 6.0)
    state = filters.tpt_state_init()
    _, y = filters.tpt_process(state, jnp.asarray(x), coefs)

    np_coefs = [np.float64(np.asarray(c, np.float64)) for c in coefs]
    expected, _ = ref.tpt_filter(x, *np_coefs)
    err = ref.error_db(np.asarray(y), expected, ref_peak=1.0)
    assert err < -90.0, f"{ftype}: {err:.1f} dB"


def test_biquad_high_q_stability():
    # high-Q lowpass is the worst case for f32 associative scans
    x = chirp(N)
    coefs = filters.biquad_coefficients(filters.LOWPASS, SR, 200.0, 4.0)
    _, y = filters.tpt_process(filters.tpt_state_init(), jnp.asarray(x), coefs)
    np_coefs = [np.float64(np.asarray(c, np.float64)) for c in coefs]
    expected, _ = ref.tpt_filter(x, *np_coefs)
    err = ref.error_db(np.asarray(y), expected, ref_peak=np.max(np.abs(expected)))
    assert err < -90.0, f"high-Q: {err:.1f} dB"


def test_biquad_state_carry_across_blocks():
    x = chirp(2 * N)
    coefs = filters.biquad_coefficients(filters.BANDPASS, SR, 2000.0, 1.5)
    state = filters.tpt_state_init()
    state, y1 = filters.tpt_process(state, jnp.asarray(x[:N]), coefs)
    state, y2 = filters.tpt_process(state, jnp.asarray(x[N:]), coefs)
    y = np.concatenate([np.asarray(y1), np.asarray(y2)])
    np_coefs = [np.float64(np.asarray(c, np.float64)) for c in coefs]
    expected, _ = ref.tpt_filter(x, *np_coefs)
    assert ref.error_db(y, expected, ref_peak=1.0) < -90.0


def test_time_varying_cutoff_ramp():
    # the reference recomputes coefficients per frame while ramping
    # (src/effect/filter.rs:160-196); we pass per-sample coefficient arrays
    x = chirp(N)
    cutoff = np.linspace(500.0, 8000.0, N).astype(np.float32)
    coefs = filters.biquad_coefficients(filters.LOWPASS, SR, jnp.asarray(cutoff), 0.707)
    _, y = filters.tpt_process(filters.tpt_state_init(), jnp.asarray(x), coefs)

    np_coefs = [np.asarray(c, np.float64) for c in coefs]
    expected, _ = ref.tpt_filter(x, *np_coefs)
    assert ref.error_db(np.asarray(y), expected, ref_peak=1.0) < -90.0


def test_svf_types_match_oracle():
    x = chirp(N)
    for ftype in filters.SVF_TYPES:
        coefs = filters.svf_coefficients(ftype, SR, 1500.0, 0.5)
        _, y = filters.tpt_process(filters.tpt_state_init(), jnp.asarray(x), coefs)
        np_coefs = [np.float64(np.asarray(c, np.float64)) for c in coefs]
        expected, _ = ref.tpt_filter(x, *np_coefs)
        assert ref.error_db(np.asarray(y), expected, ref_peak=1.0) < -90.0, ftype


def test_svf_resonance_near_self_oscillation():
    x = chirp(N)
    coefs = filters.svf_coefficients(filters.LOWPASS, SR, 800.0, 0.95)
    _, y = filters.tpt_process(filters.tpt_state_init(), jnp.asarray(x), coefs)
    np_coefs = [np.float64(np.asarray(c, np.float64)) for c in coefs]
    expected, _ = ref.tpt_filter(x, *np_coefs)
    err = ref.error_db(np.asarray(y), expected, ref_peak=np.max(np.abs(expected)))
    assert err < -80.0, f"res 0.95: {err:.1f} dB"


def test_batched_channels():
    x = np.stack([chirp(N), chirp(N, 100, 5000)])
    coefs = filters.biquad_coefficients(filters.HIGHPASS, SR, 300.0, 0.707)
    state = filters.tpt_state_init((2,))
    _, y = filters.tpt_process(state, jnp.asarray(x), coefs)
    assert y.shape == (2, N)
    np_coefs = [np.float64(np.asarray(c, np.float64)) for c in coefs]
    for ch in range(2):
        expected, _ = ref.tpt_filter(x[ch], *np_coefs)
        assert ref.error_db(np.asarray(y[ch]), expected, ref_peak=1.0) < -90.0


def test_dc_filter():
    x = chirp(N) + 0.5  # DC offset
    r = filters.dc_coefficient(SR, "default")
    state = filters.dc_state_init()
    state, y = filters.dc_process(state, jnp.asarray(x), r)
    expected = ref.dc_filter(x, r)
    assert ref.error_db(np.asarray(y), expected, ref_peak=1.0) < -90.0
    # the 0.5 DC offset is actually removed (remaining mean is the chirp's own)
    assert abs(np.mean(np.asarray(y)[N // 2:])) < 0.05
