"""Pallas TPU kernels for first/second-order linear recurrences.

The kernels run the same recurrences as ops/scan.py as an in-VMEM
Hillis-Steele doubling scan with ALL recurrence lanes batched into the
sublane dimension, so one kernel invocation solves every lane at once and
the intermediate sweep arrays never round-trip through HBM.

NOTE (round 4): the "0.019 ms vs 0.022 ms wash" once quoted here was a
speculator-era fake (see CLAUDE.md 'THE SPECULATOR' — both numbers were
measured before the first device->host read, i.e. without real execution).
In forced-real mode the associative scan costs ~milliseconds per lane and
scales linearly with vmapped lanes; production routing now uses the
two-level chunked evaluation in ops/scan.py (_chunked_first/_chunked_second,
lane-flat) for long blocks.  These Pallas kernels remain an opt-in
alternative (``PHONIC_TPU_PALLAS=1``) whose main advantage is compile time
(sub-second vs ~a minute through the remote-relay compiler).

Layout: streams arrive ``[R, T]`` (recurrence lanes x time, time in the
lane dimension — the engine's native ``[..., T]`` layout, no transposes).
The time axis is chunked through the pallas grid; the running state carries
across grid steps in VMEM scratch (TPU grids execute sequentially).

Semantics match ops/scan.py exactly:

    y[n] = a[n] * y[n-1] + b[n],          y[-1] = y0          (iir1)
    s[n] = A[n] @ s[n-1] + b[n],          s[-1] = s0          (iir2)

Association order differs from XLA's associative_scan, so f32 results can
differ in the last bits (both are validated < -90 dB against float64
oracles; tests/test_pallas_scan.py pins equivalence).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128  # TPU lane width: T-chunks must be multiples of this
_SUBLANE = 8  # f32 sublane tile: R is padded to a multiple of this


def _shift_mask(shape, s):
    """Row vector mask: lanes with time-index >= s (2D iota for TPU)."""
    t_ids = jax.lax.broadcasted_iota(jnp.int32, shape, dimension=1)
    return t_ids >= s


def _roll_t(x, s):
    """x shifted so position t holds x[t - s] (zeros in t < s; those lanes
    are masked by the caller)."""
    pad = jnp.zeros((x.shape[0], s), x.dtype)
    return jnp.concatenate([pad, x[:, : x.shape[1] - s]], axis=1)


def _scan1_chunk(a, b):
    """In-register inclusive scan of ((a, b)) over the lane/time axis."""
    tc = a.shape[1]
    s = 1
    while s < tc:
        mask = _shift_mask(a.shape, s)
        a_sh = _roll_t(a, s)
        b_sh = _roll_t(b, s)
        b = jnp.where(mask, a * b_sh + b, b)
        a = jnp.where(mask, a * a_sh, a)
        s *= 2
    return a, b


def _iir1_kernel(a_ref, b_ref, y0_ref, out_ref, carry_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        carry_ref[:, :] = y0_ref[:, :]

    a, b = _scan1_chunk(a_ref[:, :], b_ref[:, :])
    y = b + a * carry_ref[:, :]
    out_ref[:, :] = y
    carry_ref[:, :] = y[:, -1:]


def _scan2_chunk(a11, a12, a21, a22, b1, b2):
    """Inclusive scan of the 2x2 affine composition over the time axis."""
    tc = a11.shape[1]
    s = 1
    while s < tc:
        mask = _shift_mask(a11.shape, s)
        l11, l12 = _roll_t(a11, s), _roll_t(a12, s)
        l21, l22 = _roll_t(a21, s), _roll_t(a22, s)
        lb1, lb2 = _roll_t(b1, s), _roll_t(b2, s)
        # right (current) composed with left (shifted): A = A_r A_l,
        # b = A_r b_l + b_r
        c11 = a11 * l11 + a12 * l21
        c12 = a11 * l12 + a12 * l22
        c21 = a21 * l11 + a22 * l21
        c22 = a21 * l12 + a22 * l22
        cb1 = a11 * lb1 + a12 * lb2 + b1
        cb2 = a21 * lb1 + a22 * lb2 + b2
        a11 = jnp.where(mask, c11, a11)
        a12 = jnp.where(mask, c12, a12)
        a21 = jnp.where(mask, c21, a21)
        a22 = jnp.where(mask, c22, a22)
        b1 = jnp.where(mask, cb1, b1)
        b2 = jnp.where(mask, cb2, b2)
        s *= 2
    return a11, a12, a21, a22, b1, b2


def _iir2_kernel(a11_ref, a12_ref, a21_ref, a22_ref, b1_ref, b2_ref,
                 s0_ref, out1_ref, out2_ref, carry_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        carry_ref[:, :] = s0_ref[:, :]

    a11, a12, a21, a22, b1, b2 = _scan2_chunk(
        a11_ref[:, :], a12_ref[:, :], a21_ref[:, :], a22_ref[:, :],
        b1_ref[:, :], b2_ref[:, :])
    c1 = carry_ref[:, 0:1]
    c2 = carry_ref[:, 1:2]
    s1 = b1 + a11 * c1 + a12 * c2
    s2 = b2 + a21 * c1 + a22 * c2
    out1_ref[:, :] = s1
    out2_ref[:, :] = s2
    carry_ref[:, 0:1] = s1[:, -1:]
    carry_ref[:, 1:2] = s2[:, -1:]


def _pad_rt(x, r_pad, t_pad, fill):
    r, t = x.shape
    if r == r_pad and t == t_pad:
        return x
    return jnp.pad(x, ((0, r_pad - r), (0, t_pad - t)), constant_values=fill)


# Cap on the per-grid-step time chunk.  Bigger chunks amortize grid overhead
# but the in-chunk doubling sweep is O(tc log tc) work with lane-unaligned
# shifts, and very wide chunks (>8k lanes) sent the remote Mosaic compile into
# the tens of minutes for the full render graph.  2048 keeps the sweep at 11
# unrolled steps and compiles quickly; per-step DMA overlaps across the grid.
_CHUNK_CAP = 2048


def _chunk_for(r_pad, n_streams, t, vmem_budget=10 * 1024 * 1024):
    """Largest lane-aligned time chunk whose working set fits VMEM."""
    # Mosaic double-buffers every grid input/output block, and the doubling
    # sweep keeps ~10 temps live: budget f32 bytes per (lane x sublane) slot.
    per_elem = 4 * (2 * (n_streams + 1) + 10)
    tc = min(vmem_budget // (r_pad * per_elem), _CHUNK_CAP)
    # no point chunking beyond the (padded) block
    t_pad = ((t + _LANE - 1) // _LANE) * _LANE
    tc = min(tc, t_pad)
    return max(_LANE, (tc // _LANE) * _LANE)


def _interpret() -> bool:
    """Compiled on TPU; interpreter mode elsewhere (CPU test meshes)."""
    return jax.default_backend() not in ("tpu", "axon")


@functools.partial(jax.jit, static_argnames=("r_pad", "t_pad", "tc"))
def _iir1_call(a, b, y0, r_pad, t_pad, tc):
    grid = t_pad // tc
    spec_rt = pl.BlockSpec((r_pad, tc), lambda i: (0, i), memory_space=pltpu.VMEM)
    spec_r = pl.BlockSpec((r_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _iir1_kernel,
        grid=(grid,),
        in_specs=[spec_rt, spec_rt, spec_r],
        out_specs=spec_rt,
        out_shape=jax.ShapeDtypeStruct((r_pad, t_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((r_pad, 1), jnp.float32)],
        interpret=_interpret(),
    )(a, b, y0)


@functools.partial(jax.jit, static_argnames=("r_pad", "t_pad", "tc"))
def _iir2_call(a11, a12, a21, a22, b1, b2, s0, r_pad, t_pad, tc):
    grid = t_pad // tc
    spec_rt = pl.BlockSpec((r_pad, tc), lambda i: (0, i), memory_space=pltpu.VMEM)
    spec_r2 = pl.BlockSpec((r_pad, 2), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((r_pad, t_pad), jnp.float32)
    return pl.pallas_call(
        _iir2_kernel,
        grid=(grid,),
        in_specs=[spec_rt] * 6 + [spec_r2],
        out_specs=(spec_rt, spec_rt),
        out_shape=(out, out),
        scratch_shapes=[pltpu.VMEM((r_pad, 2), jnp.float32)],
        interpret=_interpret(),
    )(a11, a12, a21, a22, b1, b2, s0)


def iir1_scan(a, b, y0):
    """Pallas first-order recurrence: drop-in core for
    ops/scan.linear_recurrence (f32, 2D ``[R, T]`` streams).

    ``a``/``b``: [R, T]; ``y0``: [R].  Returns y [R, T].
    """
    r, t = b.shape
    r_pad = max(_SUBLANE, ((r + _SUBLANE - 1) // _SUBLANE) * _SUBLANE)
    t_pad = ((t + _LANE - 1) // _LANE) * _LANE
    tc = _chunk_for(r_pad, 3, t)
    t_pad = ((t_pad + tc - 1) // tc) * tc
    a = _pad_rt(a.astype(jnp.float32), r_pad, t_pad, 1.0)
    b = _pad_rt(b.astype(jnp.float32), r_pad, t_pad, 0.0)
    y0 = jnp.pad(y0.astype(jnp.float32), (0, r_pad - r))[:, None]
    y = _iir1_call(a, b, y0, r_pad, t_pad, tc)
    return y[:r, :t]


def iir2_scan(a11, a12, a21, a22, b1, b2, s0_1, s0_2):
    """Pallas 2-vector recurrence: drop-in core for
    ops/scan.linear_recurrence_2 (f32, 2D ``[R, T]`` streams).

    Coefficient streams: [R, T]; initial state s0_*: [R].
    Returns (s1, s2) each [R, T].
    """
    r, t = b1.shape
    r_pad = max(_SUBLANE, ((r + _SUBLANE - 1) // _SUBLANE) * _SUBLANE)
    t_pad = ((t + _LANE - 1) // _LANE) * _LANE
    tc = _chunk_for(r_pad, 8, t)
    t_pad = ((t_pad + tc - 1) // tc) * tc
    ident = lambda x: _pad_rt(x.astype(jnp.float32), r_pad, t_pad, 1.0)
    zero = lambda x: _pad_rt(x.astype(jnp.float32), r_pad, t_pad, 0.0)
    a11, a22 = ident(a11), ident(a22)
    a12, a21, b1, b2 = zero(a12), zero(a21), zero(b1), zero(b2)
    s0 = jnp.stack([
        jnp.pad(s0_1.astype(jnp.float32), (0, r_pad - r)),
        jnp.pad(s0_2.astype(jnp.float32), (0, r_pad - r)),
    ], axis=1)
    s1, s2 = _iir2_call(a11, a12, a21, a22, b1, b2, s0, r_pad, t_pad, tc)
    return s1[:r, :t], s2[:r, :t]


def pallas_scan_supported() -> bool:
    """True when the default backend can run these kernels compiled."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover - backend probing never raises today
        return False


__all__ = ["iir1_scan", "iir2_scan", "pallas_scan_supported"]
