import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from phonic_tpu.graph.nodes import BuildCtx
from phonic_tpu.effects import delay as delay_fx

import reference_dsp as ref

SR = 48000


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


def impulse_input(n):
    x = np.zeros((2, n), np.float32)
    x[0, 100] = 1.0
    x[1, 100] = 0.5
    x[:, 200:400] = 0.1
    return x


@pytest.mark.parametrize("mode", ["Stereo", "Ping Pong"])
def test_delay_matches_oracle(mode):
    n = 4 * 4096  # whole blocks
    x = impulse_input(n)
    node = delay_fx.DelayEffect(
        mode=mode, delay_ms=100.0, feedback=0.6, filter_cutoff=4000.0,
        drive=0.3, wet=0.5, width=0.8, min_delay_ms=40.0,
    )
    got = run_node(node, x, n)
    b = node._subblock(BuildCtx(SR, 2, 4096, 8))
    expected = ref.dub_delay(
        x, SR, mode, 100.0, 0.6, "Lowpass", 4000.0, 0.3, 0.5, 0.8,
        min_delay_samples=b + 1,
    )
    err = ref.error_db(got, expected, ref_peak=np.max(np.abs(expected)))
    assert err < -90.0, f"delay[{mode}] err {err:.1f} dB"


def test_delay_lfo_modulation_matches_oracle():
    # smooth input: fractional-delay modulation error scales with the signal
    # derivative, so impulses would only measure f32-vs-f64 LFO phase noise
    n = 4 * 4096
    t = np.arange(n) / SR
    x = np.stack([
        (0.5 * np.sin(2 * np.pi * 330 * t) * np.exp(-t * 4)),
        (0.5 * np.sin(2 * np.pi * 220 * t) * np.exp(-t * 4)),
    ]).astype(np.float32)
    node = delay_fx.DelayEffect(
        delay_ms=150.0, feedback=0.5, wet=1.0, width=1.0,
        lfo_rate=2.0, lfo_to_time=0.3, lfo_to_feedback=0.2, lfo_to_filter=0.4,
        filter_cutoff=3000.0, min_delay_ms=40.0,
    )
    got = run_node(node, x, n)
    b = node._subblock(BuildCtx(SR, 2, 4096, 8))
    expected = ref.dub_delay(
        x, SR, "Stereo", 150.0, 0.5, "Lowpass", 3000.0, 0.0, 1.0, 1.0,
        lfo_rate=2.0, lfo_depth_time=0.3, lfo_depth_fb=0.2, lfo_depth_filter=0.4,
        min_delay_samples=b + 1,
    )
    err = ref.error_db(got, expected, ref_peak=np.max(np.abs(expected)))
    assert err < -70.0, f"delay lfo err {err:.1f} dB"


def test_delay_echo_timing():
    # an impulse must come back at exactly the delay time, scaled by feedback
    n = 12 * 4096
    x = np.zeros((2, n), np.float32)
    x[:, 0] = 1.0
    node = delay_fx.DelayEffect(delay_ms=250.0, feedback=0.5, wet=0.5,
                                width=1.0, filter_cutoff=20000.0)
    got = run_node(node, x, n)
    d = int(0.25 * SR)
    # first echo (dc filter slightly shifts amplitude; check window peak)
    w1 = np.abs(got[0, d - 10:d + 10]).max()
    w2 = np.abs(got[0, 2 * d - 10:2 * d + 10]).max()
    assert w1 > 0.5, w1
    assert 0.3 < w2 / w1 < 0.7  # ~feedback ratio
