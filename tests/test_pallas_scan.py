"""Equivalence of the Pallas scan kernels (ops/pallas_scan.py) with the XLA
associative-scan reference (ops/scan.py).

On CPU the kernels run in Pallas interpreter mode, so T is kept small.  The
multi-chunk grid (state carried across grid steps in VMEM scratch) is
exercised explicitly by calling the kernel with a small time chunk.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phonic_tpu.ops import pallas_scan
from phonic_tpu.ops.scan import linear_recurrence, linear_recurrence_2

rng = np.random.default_rng(7)


def _mk1(r, t):
    a = jnp.asarray(rng.uniform(0.8, 0.999, (r, t)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(r, t)).astype(np.float32))
    y0 = jnp.asarray(rng.normal(size=(r,)).astype(np.float32))
    return a, b, y0


def _mk2(r, t):
    a11 = jnp.asarray(rng.uniform(0.7, 0.95, (r, t)).astype(np.float32))
    a12 = jnp.asarray(rng.uniform(-0.2, 0.2, (r, t)).astype(np.float32))
    a21 = jnp.asarray(rng.uniform(-0.2, 0.2, (r, t)).astype(np.float32))
    a22 = jnp.asarray(rng.uniform(0.7, 0.95, (r, t)).astype(np.float32))
    b1 = jnp.asarray(rng.normal(size=(r, t)).astype(np.float32))
    b2 = jnp.asarray(rng.normal(size=(r, t)).astype(np.float32))
    s01 = jnp.asarray(rng.normal(size=(r,)).astype(np.float32))
    s02 = jnp.asarray(rng.normal(size=(r,)).astype(np.float32))
    return a11, a12, a21, a22, b1, b2, s01, s02


def test_iir1_matches_associative_scan():
    a, b, y0 = _mk1(5, 700)
    ref = np.asarray(linear_recurrence(a, b, y0))
    pal = np.asarray(pallas_scan.iir1_scan(a, b, y0))
    assert np.abs(ref - pal).max() < 1e-4


def test_iir2_matches_associative_scan():
    args = _mk2(3, 500)
    r1, r2 = linear_recurrence_2(*args)
    p1, p2 = pallas_scan.iir2_scan(*args)
    assert np.abs(np.asarray(r1) - np.asarray(p1)).max() < 1e-4
    assert np.abs(np.asarray(r2) - np.asarray(p2)).max() < 1e-4


def test_iir1_multichunk_state_carry():
    # Tiny time chunk -> several grid steps; the carry must flow across them.
    a, b, y0 = _mk1(2, 512)
    ref = np.asarray(linear_recurrence(a, b, y0))
    r_pad, t_pad, tc = 8, 512, 128
    a_p = jnp.pad(a, ((0, r_pad - 2), (0, 0)), constant_values=1.0)
    b_p = jnp.pad(b, ((0, r_pad - 2), (0, 0)))
    y0_p = jnp.pad(y0, (0, r_pad - 2))[:, None]
    y = pallas_scan._iir1_call(a_p, b_p, y0_p, r_pad, t_pad, tc)
    assert np.abs(ref - np.asarray(y)[:2]).max() < 1e-4


def test_iir2_multichunk_state_carry():
    args = _mk2(2, 384)
    r1, _ = linear_recurrence_2(*args)
    r_pad, t_pad, tc = 8, 384, 128
    a11, a12, a21, a22, b1, b2, s01, s02 = args
    ident = lambda x: jnp.pad(x, ((0, r_pad - 2), (0, 0)), constant_values=1.0)
    zero = lambda x: jnp.pad(x, ((0, r_pad - 2), (0, 0)))
    s0 = jnp.stack([jnp.pad(s01, (0, r_pad - 2)),
                    jnp.pad(s02, (0, r_pad - 2))], axis=1)
    p1, _ = pallas_scan._iir2_call(ident(a11), zero(a12), zero(a21),
                                   ident(a22), zero(b1), zero(b2), s0,
                                   r_pad, t_pad, tc)
    assert np.abs(np.asarray(r1) - np.asarray(p1)[:2]).max() < 1e-4


def test_iir1_under_vmap():
    a, b, y0 = _mk1(6, 300)
    a, b, y0 = a.reshape(2, 3, 300), b.reshape(2, 3, 300), y0.reshape(2, 3)
    ref = np.asarray(jax.vmap(lambda a, b, y0: linear_recurrence(a, b, y0))(a, b, y0))
    pal = np.asarray(jax.vmap(pallas_scan.iir1_scan)(a, b, y0))
    assert np.abs(ref - pal).max() < 1e-4


def test_routing_uses_xla_on_cpu():
    # On CPU the production entry points must keep the XLA path (pallas
    # interpret mode would be orders of magnitude slower).
    assert not pallas_scan.pallas_scan_supported()


def test_routing_is_opt_in(monkeypatch):
    # Default: XLA everywhere (measured a steady-state wash on TPU; see
    # ops/scan._use_pallas).  PHONIC_TPU_PALLAS=1 enables it for eligible
    # shapes on a supported backend.
    from phonic_tpu.ops import scan as scan_mod

    monkeypatch.delenv("PHONIC_TPU_PALLAS", raising=False)
    assert not scan_mod._use_pallas(jnp.float32, 131072)
    monkeypatch.setenv("PHONIC_TPU_PALLAS", "1")
    monkeypatch.setattr(pallas_scan, "pallas_scan_supported", lambda: True)
    assert scan_mod._use_pallas(jnp.float32, 131072)
    assert not scan_mod._use_pallas(jnp.float32, 512)       # too short
    assert not scan_mod._use_pallas(jnp.float64, 131072)    # f64 strict mode
    assert not scan_mod._use_pallas(jnp.float32, 131072, reverse=True)


@pytest.mark.parametrize("t", [1, 2, 130])
def test_iir1_odd_lengths(t):
    a, b, y0 = _mk1(3, t)
    ref = np.asarray(linear_recurrence(a, b, y0))
    pal = np.asarray(pallas_scan.iir1_scan(a, b, y0))
    assert np.abs(ref - pal).max() < 1e-4
