"""f64 strict-parity sweep (VERDICT r1 item 5): with scan_dtype=float64 the
chorus / gate / delay / reverb feedback paths must match their per-sample
f64 oracles to <= -90 dB, proving the remaining default-mode (f32) gap is
pure float32 accumulation in the feedback state — the same state the
reference keeps in f64 (src/utils/dsp/delay.rs) — and not an algorithmic
deviation.  EngineConfig(scan_dtype=float64) is the production switch.
"""

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from phonic_tpu.graph.nodes import BuildCtx
from phonic_tpu.effects import chorus as chorus_fx
from phonic_tpu.effects import delay as delay_fx
from phonic_tpu.effects import gate as gate_fx
from phonic_tpu.effects import reverb as reverb_fx

import reference_dsp as ref

SR = 48000


def smooth_input(n, seed=3):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / SR
    x = np.stack([
        0.4 * np.sin(2 * np.pi * 220 * t) * np.exp(-t * 3),
        0.4 * np.sin(2 * np.pi * 330 * t + 0.5) * np.exp(-t * 3),
    ]).astype(np.float32)
    x[:, : n // 8] += (0.05 * rng.normal(size=(2, n // 8))).astype(np.float32)
    return x


def run_node(node, x, n, block=4096, dtype=jnp.float64):
    ctx = BuildCtx(SR, 2, block, 8, scan_dtype=dtype)
    state = node.init_state(ctx)
    outs = []
    for t0 in range(0, n, block):
        params = {
            pid: jnp.full((block,), np.float32(v))
            for pid, v in node.param_initials().items()
        }
        params["_frame0"] = jnp.int32(t0)
        state, y = node.process(state, jnp.asarray(x[:, t0:t0 + block]),
                                params, ctx)
        outs.append(np.asarray(y))
    return np.concatenate(outs, axis=1)


def _err(got, expected):
    return ref.error_db(got, expected, ref_peak=np.max(np.abs(expected)))


def test_chorus_f64_below_minus_90db():
    n = 6 * 4096
    x = smooth_input(n)
    node = chorus_fx.ChorusEffect(rate=1.5, depth=0.4, feedback=0.4,
                                  delay_ms=15.0, wet=0.6, filter_freq=8000.0,
                                  filter_resonance=0.2)
    got = run_node(node, x, n)
    b = node._subblock(BuildCtx(SR, 2, 4096, 8))
    expected = ref.chorus(x, SR, 1.5, np.pi / 2, 0.4, 0.4, 15.0, 0.6,
                          8000.0, 0.2, min_pos_samples=b + 1)
    err = _err(got, expected)
    assert err < -90.0, f"chorus f64 err {err:.1f} dB"


@pytest.mark.parametrize("mode", ["Stereo", "Ping Pong"])
def test_delay_f64_below_minus_90db(mode):
    n = 4 * 4096
    x = np.zeros((2, n), np.float32)
    x[0, 100] = 1.0
    x[1, 100] = 0.5
    x[:, 200:400] = 0.1
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
    err = _err(got, expected)
    assert err < -90.0, f"delay[{mode}] f64 err {err:.1f} dB"


def test_gate_f64_below_minus_90db():
    n = 4 * 4096
    rng = np.random.default_rng(5)
    t = np.arange(n) / SR
    x = (0.5 * np.sin(2 * np.pi * 220 * t)
         * (np.sin(2 * np.pi * 2.0 * t) > 0)).astype(np.float32)
    x = np.stack([x, 0.7 * x])
    node = gate_fx.GateEffect(threshold=-30.0, attack=0.005, hold=0.05,
                              release=0.1, range_db=-60.0)
    got = run_node(node, x, n)
    gains = ref.gate_gains(x, SR, -30.0, 0.005, 0.05, 0.1, -60.0)
    expected = x * gains[None, :]
    err = _err(got, expected)
    assert err < -90.0, f"gate f64 err {err:.1f} dB"


def test_reverb_f64_below_minus_90db_no_vibrato():
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
    expected = ref.reverb(x, SR, 0.6, 0.5, vib, vib_depth=0.0,
                          line_depth=0.0)
    err = _err(got, expected)
    assert err < -90.0, f"reverb f64 err {err:.1f} dB"
