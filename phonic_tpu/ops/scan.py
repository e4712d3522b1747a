"""Parallel evaluation of linear recurrences via ``lax.associative_scan``.

This is the substrate that lets every recursive DSP unit in the reference
(one-pole smoothers src/utils/smoothing.rs, biquads
src/utils/dsp/filters/biquad.rs, DC filters src/utils/dsp/filters/dc.rs,
envelope followers src/utils/dsp/envelope.rs) run as a *parallel* TPU program
instead of a per-sample loop: a first- or second-order recurrence
``s[n] = A[n] s[n-1] + b[n]`` is an associative composition, so a block of N
samples evaluates in O(log N) depth on the VPU.

Time-varying coefficients are free: every element carries its own ``A[n]``,
which directly solves parameter-ramped filters (the reference recomputes
biquad coefficients per frame while ramping, src/effect/filter.rs:160-196).

For *stable* filters the recurrence is contractive, so the scan's f32
rounding error stays bounded (long-range products decay geometrically);
tests/test_biquad.py validates < -90 dB error vs SciPy float64.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Minimum block length for routing through the Pallas kernels: below this the
# XLA associative scan's overhead is irrelevant and pallas_call's fixed cost
# isn't worth paying.
_PALLAS_MIN_T = 2048


def _use_pallas(dtype, t, reverse=False) -> bool:
    """Route through ops/pallas_scan only when explicitly requested.

    Measured on the target TPU (standalone second-order scan, [2, 131072],
    both paths under jit): XLA associative scan 0.019 ms/block steady vs
    Pallas 0.022 ms — a wash at steady state, so the default stays XLA.
    The Pallas path's real advantage is compile time (0.9 s vs 61.8 s for
    the standalone program on this remote-relay backend); set
    ``PHONIC_TPU_PALLAS=1`` to opt in when iterating on graph shapes.
    """
    import os

    if os.environ.get("PHONIC_TPU_PALLAS", "").lower() not in ("1", "true", "on"):
        return False
    if reverse or t < _PALLAS_MIN_T or dtype != jnp.float32:
        return False
    from .pallas_scan import pallas_scan_supported

    return pallas_scan_supported()


def linear_recurrence(a, b, y0, axis: int = -1, reverse: bool = False):
    """Solve ``y[n] = a[n] * y[n-1] + b[n]`` with ``y[-1] = y0``.

    a, b: broadcastable arrays with the recurrence along ``axis``.
    y0: initial state, shaped like a/b without ``axis``.
    Returns y with the same shape as ``b``.
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    a, b = jnp.broadcast_arrays(a, b)
    if axis != -1:
        a = jnp.moveaxis(a, axis, -1)
        b = jnp.moveaxis(b, axis, -1)

    if _use_pallas(b.dtype, b.shape[-1], reverse):
        from .pallas_scan import iir1_scan

        lead = b.shape[:-1]
        t = b.shape[-1]
        y0_full = jnp.broadcast_to(jnp.asarray(y0, b.dtype), lead)
        r = int(np.prod(lead)) if lead else 1
        y = iir1_scan(a.reshape(r, t), b.reshape(r, t), y0_full.reshape(r))
        y = y.reshape(lead + (t,))
        if axis != -1:
            y = jnp.moveaxis(y, -1, axis)
        return y

    # Fold the initial state into the first element: b[0] += a[0] * y0.
    y0 = jnp.asarray(y0, b.dtype)
    first = b[..., 0] + a[..., 0] * y0
    b = jnp.concatenate([first[..., None], b[..., 1:]], axis=-1)

    def combine(lhs, rhs):
        a_l, b_l = lhs
        a_r, b_r = rhs
        return a_r * a_l, a_r * b_l + b_r

    _, y = jax.lax.associative_scan(combine, (a, b), axis=-1, reverse=reverse)
    if axis != -1:
        y = jnp.moveaxis(y, -1, axis)
    return y


def linear_recurrence_2(a11, a12, a21, a22, b1, b2, s0_1, s0_2, axis: int = -1):
    """Solve the 2-vector recurrence ``s[n] = A[n] s[n-1] + b[n]``.

    All six coefficient arrays share the recurrence ``axis``.  The 2x2
    composition is expanded into scalar ops so everything stays elementwise
    on the VPU (no tiny matmuls).  Returns (s1, s2) along the axis.
    """
    arrs = jnp.broadcast_arrays(a11, a12, a21, a22, b1, b2)
    if axis != -1:
        arrs = [jnp.moveaxis(x, axis, -1) for x in arrs]
    a11, a12, a21, a22, b1, b2 = arrs

    if _use_pallas(b1.dtype, b1.shape[-1]):
        from .pallas_scan import iir2_scan

        lead = b1.shape[:-1]
        t = b1.shape[-1]
        r = int(np.prod(lead)) if lead else 1
        s1_full = jnp.broadcast_to(jnp.asarray(s0_1, b1.dtype), lead).reshape(r)
        s2_full = jnp.broadcast_to(jnp.asarray(s0_2, b2.dtype), lead).reshape(r)
        s1, s2 = iir2_scan(
            a11.reshape(r, t), a12.reshape(r, t),
            a21.reshape(r, t), a22.reshape(r, t),
            b1.reshape(r, t), b2.reshape(r, t), s1_full, s2_full)
        s1 = s1.reshape(lead + (t,))
        s2 = s2.reshape(lead + (t,))
        if axis != -1:
            s1 = jnp.moveaxis(s1, -1, axis)
            s2 = jnp.moveaxis(s2, -1, axis)
        return s1, s2

    s0_1 = jnp.asarray(s0_1, b1.dtype)
    s0_2 = jnp.asarray(s0_2, b2.dtype)
    first1 = b1[..., 0] + a11[..., 0] * s0_1 + a12[..., 0] * s0_2
    first2 = b2[..., 0] + a21[..., 0] * s0_1 + a22[..., 0] * s0_2
    b1 = jnp.concatenate([first1[..., None], b1[..., 1:]], axis=-1)
    b2 = jnp.concatenate([first2[..., None], b2[..., 1:]], axis=-1)

    def combine(lhs, rhs):
        l11, l12, l21, l22, lb1, lb2 = lhs
        r11, r12, r21, r22, rb1, rb2 = rhs
        # A = A_r @ A_l ; b = A_r @ b_l + b_r
        c11 = r11 * l11 + r12 * l21
        c12 = r11 * l12 + r12 * l22
        c21 = r21 * l11 + r22 * l21
        c22 = r21 * l12 + r22 * l22
        cb1 = r11 * lb1 + r12 * lb2 + rb1
        cb2 = r21 * lb1 + r22 * lb2 + rb2
        return c11, c12, c21, c22, cb1, cb2

    out = jax.lax.associative_scan(
        combine, (a11, a12, a21, a22, b1, b2), axis=-1
    )
    s1, s2 = out[4], out[5]
    if axis != -1:
        s1 = jnp.moveaxis(s1, -1, axis)
        s2 = jnp.moveaxis(s2, -1, axis)
    return s1, s2


def linear_recurrence_reference(a, b, y0, axis: int = -1):
    """Sequential ``lax.scan`` version of :func:`linear_recurrence` — the
    correctness oracle for tests and a fallback for very short blocks."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    a, b = jnp.broadcast_arrays(a, b)
    if axis != -1:
        a = jnp.moveaxis(a, axis, -1)
        b = jnp.moveaxis(b, axis, -1)
    y0 = jnp.broadcast_to(jnp.asarray(y0, b.dtype), b.shape[:-1])

    def step(carry, ab):
        a_n, b_n = ab
        y = a_n * carry + b_n
        return y, y

    _, y = jax.lax.scan(step, y0, (jnp.moveaxis(a, -1, 0), jnp.moveaxis(b, -1, 0)))
    y = jnp.moveaxis(y, 0, -1)
    if axis != -1:
        y = jnp.moveaxis(y, -1, axis)
    return y
