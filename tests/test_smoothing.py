import numpy as np
import jax.numpy as jnp

from phonic_tpu.ops import smoothing
from phonic_tpu.config import DEFAULT_INERTIA

import reference_dsp as ref

SR = 48000
N = 2048
K = 4


def make_events(times_values):
    times = np.full(K, N, np.int32)
    values = np.zeros(K, np.float32)
    for i, (t, v) in enumerate(times_values):
        times[i] = t
        values[i] = v
    return smoothing.SegmentEvents(jnp.asarray(times), jnp.asarray(values))


def run_oracle(sm, times_values, n):
    out = np.empty(n, np.float32)
    ev = dict(times_values)
    for i in range(n):
        if i in ev:
            sm.set_target(ev[i])
        out[i] = sm.next()
    return out


def test_exp_smoother_single_ramp():
    alpha = smoothing.exp_alpha(DEFAULT_INERTIA, SR)
    state = smoothing.exp_smoother_init(0.0)
    events = make_events([(0, 1.0)])
    state2, y = smoothing.exp_smoother_block(state, events, N, alpha)

    oracle = ref.ExpSmoother(0.0, SR)
    expected = run_oracle(oracle, [(0, 1.0)], N)
    np.testing.assert_allclose(np.asarray(y), expected, atol=2e-5)
    # snap-to-target happened (reference terminates ramps)
    assert float(y[-1]) == 1.0
    assert abs(float(state2.current) - float(oracle.current)) < 2e-5


def test_exp_smoother_multi_events_and_carry():
    alpha = smoothing.exp_alpha(DEFAULT_INERTIA, SR)
    state = smoothing.exp_smoother_init(0.5)
    evs = [(100, 1.0), (300, -0.25), (301, 0.8), (1900, 0.0)]
    events = make_events(evs)
    state2, y = smoothing.exp_smoother_block(state, events, N, alpha)

    oracle = ref.ExpSmoother(0.5, SR)
    expected = run_oracle(oracle, evs, N)
    np.testing.assert_allclose(np.asarray(y), expected, atol=3e-5)

    # render a second block with no events: state must carry over exactly
    events2 = smoothing.no_events(K, N)
    _, y2 = smoothing.exp_smoother_block(state2, events2, N, alpha)
    expected2 = oracle.run(N)
    np.testing.assert_allclose(np.asarray(y2), expected2, atol=3e-5)


def test_exp_smoother_no_ramp_needed():
    alpha = smoothing.exp_alpha(DEFAULT_INERTIA, SR)
    state = smoothing.exp_smoother_init(0.7)
    _, y = smoothing.exp_smoother_block(state, smoothing.no_events(K, N), N, alpha)
    np.testing.assert_array_equal(np.asarray(y), np.float32(0.7))


def test_lin_smoother():
    state = smoothing.lin_smoother_init(0.0, step=0.01, sample_rate=SR)
    evs = [(10, 1.0), (500, -0.5)]
    events = make_events(evs)
    state2, y = smoothing.lin_smoother_block(state, events, N)

    oracle = ref.LinSmoother(0.0, SR, step=0.01)
    expected = run_oracle(oracle, evs, N)
    np.testing.assert_allclose(np.asarray(y), expected, atol=2e-5)

    _, y2 = smoothing.lin_smoother_block(state2, smoothing.no_events(K, N), N)
    expected2 = oracle.run(N)
    np.testing.assert_allclose(np.asarray(y2), expected2, atol=2e-5)


def test_lin_smoother_ramp_crosses_block():
    # a long ramp that spans multiple blocks
    state = smoothing.lin_smoother_init(0.0, step=0.0001, sample_rate=SR)
    events = make_events([(0, 1.0)])
    oracle = ref.LinSmoother(0.0, SR, step=0.0001)
    oracle.set_target(1.0)
    for blk in range(4):
        ev = events if blk == 0 else smoothing.no_events(K, N)
        state, y = smoothing.lin_smoother_block(state, ev, N)
        expected = oracle.run(N)
        np.testing.assert_allclose(np.asarray(y), expected, atol=3e-4)


def test_spring_smoother():
    omega = smoothing.spring_omega(4410)
    state = smoothing.spring_smoother_init(0.0)
    evs = [(50, 1.0), (1200, 0.2)]
    events = make_events(evs)
    state2, y = smoothing.spring_smoother_block(state, events, N, omega, SR)

    oracle = ref.SpringSmoother(0.0, SR)
    expected = run_oracle(oracle, evs, N)
    np.testing.assert_allclose(np.asarray(y), expected, atol=1e-3)

    # continuity across blocks
    _, y2 = smoothing.spring_smoother_block(
        state2, smoothing.no_events(K, N), N, omega, SR
    )
    expected2 = oracle.run(N)
    np.testing.assert_allclose(np.asarray(y2), expected2, atol=1e-3)
    # no velocity discontinuity: first diff is small at block seam
    seam = abs(float(y2[0]) - float(y[-1]))
    assert seam < 0.01
