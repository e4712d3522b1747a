"""Ring delay-line primitives (ops/ring.py).

Regression coverage for the float32 write-position precision bug: wpos grows
to 2^30 before wrapping, and casting it to float32 past 2^24 frames (~6 min
at 48 kHz) quantized the interpolation fraction to 0 and shifted reads to
wrong slots.  ring_read_frac must reduce wpos mod R before any float cast.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from phonic_tpu.ops import ring as ring_ops


def _ring_at_wpos(wpos: int, r: int = 256):
    """A 1-channel ring whose slot k holds the total frame index of the
    sample written there, for the given cumulative write position."""
    idx = np.arange(r)
    # slot k was last written at frame f where f % r == k and f < wpos
    last = wpos - 1 - ((wpos - 1 - idx) % r)
    buf = jnp.asarray(last[None, :], jnp.float32)
    return ring_ops.Ring(buf, jnp.int32(wpos & (2**30 - 1)))


@pytest.mark.parametrize("wpos", [300, 2**24 + 3, 2**30 - 256, 2**29 + 12345])
def test_read_frac_exact_at_large_wpos(wpos):
    """Integer-offset reads land on the exact slot regardless of how large
    the cumulative write position has grown."""
    ring = _ring_at_wpos(wpos)
    offsets = jnp.asarray([1.0, 7.0, 100.0, 255.0], jnp.float32)
    got = np.asarray(ring_ops.ring_read_frac(ring, offsets))[0]
    # reading o frames ago must return the sample written at frame wpos - o
    # (as stored, i.e. f32-rounded)
    want = np.asarray([wpos - o for o in [1, 7, 100, 255]]).astype(np.float32)
    np.testing.assert_array_equal(got, want)


def test_read_frac_fraction_survives_large_wpos():
    """The interpolation fraction must not quantize to 0 at large wpos."""
    r = 64
    buf = jnp.zeros((1, r), jnp.float32).at[0, :].set(
        jnp.arange(r, dtype=jnp.float32))
    for wpos in (64, 2**24 + 64, 2**30 - 64):
        ring = ring_ops.Ring(buf, jnp.int32(wpos & (2**30 - 1)))
        a = np.asarray(ring_ops.ring_read_frac(ring, jnp.float32(10.25)))
        b = np.asarray(ring_ops.ring_read_frac(ring, jnp.float32(10.0)))
        c = np.asarray(ring_ops.ring_read_frac(ring, jnp.float32(11.0)))
        # value at 10.25 must sit strictly between the two integer taps
        assert not np.allclose(a, b), f"fraction lost at wpos={wpos}"
        np.testing.assert_allclose(a, b + 0.25 * (c - b), rtol=1e-5)


def test_write_then_read_roundtrip_large_wpos():
    """Block write + fractional read agree with a NumPy model at a wpos past
    the old f32 precision cliff."""
    r, b = 128, 32
    base = (2**24 + 5 * b) & ~(b - 1)  # keep writes B-aligned like the engine
    rng = np.random.default_rng(7)
    data = rng.standard_normal((1, b)).astype(np.float32)
    start_buf = rng.standard_normal((1, r)).astype(np.float32)
    ring = ring_ops.Ring(jnp.asarray(start_buf), jnp.int32(base))
    ring = ring_ops.ring_write_block(ring, jnp.asarray(data))
    model = start_buf.copy()
    model[0, (base + np.arange(b)) % r] = data[0]
    offs = np.asarray([1.0, 2.5, float(b), float(b) + 0.75], np.float32)
    got = np.asarray(ring_ops.ring_read_frac(ring, jnp.asarray(offs)))[0]
    pos = (base + b - offs.astype(np.float64)) % r
    ip = np.floor(pos).astype(int)
    frac = pos - ip
    want = (model[0, ip % r] * (1 - frac) + model[0, (ip + 1) % r] * frac)
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-5)
