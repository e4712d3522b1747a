"""Device-edge master volume (reference: OutputDevice::volume,
src/output.rs:51, applied as a smoothed gain in the callback,
src/output/cpal.rs:717-720): exponential-smoother trajectory identical to
the reference's ExponentialSmoothedValue (per-sample oracle), applied by
every output's write()."""

import numpy as np

from phonic_tpu.config import (DEFAULT_INERTIA, SMOOTHER_EPSILON,
                               SMOOTHER_REFERENCE_SR)
from phonic_tpu.outputs.null import NullOutput


def oracle_gains(cur, tgt, n, sr):
    """Per-sample reference smoother: current += alpha*(target-current),
    snap when the step falls under epsilon (src/utils/smoothing.rs:122-233)."""
    alpha = DEFAULT_INERTIA * SMOOTHER_REFERENCE_SR / sr
    out = np.empty(n, np.float64)
    for i in range(n):
        step = alpha * (tgt - cur)
        cur = tgt if abs(step) <= SMOOTHER_EPSILON else cur + step
        out[i] = cur
    return out


def test_volume_ramp_matches_reference_smoother():
    out = NullOutput(44100, 2)
    out.set_volume(0.25)
    assert out.volume == 0.25
    block = np.ones((2, 4096), np.float32)
    got = np.asarray(out._apply_volume(block))[0]
    want = oracle_gains(1.0, 0.25, 4096, 44100)
    np.testing.assert_allclose(got, want, atol=1e-6)
    # second block continues the ramp from carried state
    got2 = np.asarray(out._apply_volume(block))[0]
    want2 = oracle_gains(want[-1], 0.25, 4096, 44100)
    np.testing.assert_allclose(got2, want2, atol=1e-6)


def test_volume_snaps_and_write_applies():
    out = NullOutput(48000, 2)
    out.set_volume(0.5)
    # long enough to fully settle
    for _ in range(8):
        y = out._apply_volume(np.ones((2, 8192), np.float32))
    np.testing.assert_allclose(np.asarray(y), 0.5, atol=1e-7)
    # settled path is a cheap constant scale
    y = out._apply_volume(np.full((2, 64), 2.0, np.float32))
    np.testing.assert_allclose(np.asarray(y), 1.0, atol=1e-7)
    out.write(np.ones((2, 256), np.float32))  # smoke: write path applies it
    out.close()
