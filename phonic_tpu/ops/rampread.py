"""Fused Pallas ramp-read: 4-point Hermite fractional reads of
ramp-structured positions, source windows DMA'd HBM->VMEM, tap selection
via in-register one-hot dots (the MXU as a lane-permute engine).

This is the round-5 replacement for the two-stage one-hot matmul read
(ops/resample.py:hermite_read_mm2) on the hot paths: file sources, sampler
voices, grain streams.  The mm2 formulation is HBM-bound — every chunk
materializes [C, 128]-wide one-hot/window intermediates to HBM and streams
the packed buffer through the MXU (docs/PERF.md: 16 sources = 21.6 ms of
the 25.6 ms headline block).  Here each grid step copies only the rows the
chunk actually touches into VMEM and every selection intermediate lives in
registers.

The buffer is packed as OVERLAPPED rows at stride 124 (the mm_pack trick,
ops/resample.py:MM_STRIDE): row r holds samples [124r, 124r+128), so the
4-tap quad of any position lives in ONE row at lanes lo..lo+3 (lo <= 123)
and selection is a single weighted one-hot dot [SL,128]@[128,128] per
(128-output group, channel, slice) — no second row-wrap pass.

Position contract (same as hermite_read_mm2): per-sample position steps
are bounded, |positions[i+1] - positions[i]| <= smax, EXCEPT at mod-fold
jumps (loops / circular wraps / pingpong folds), which are exact: a folded
128-output group's position VALUES occupy at most two clusters, each of
spread <= 127*smax + 4, covered by the group's two row slices; a folded
chunk's slice anchors occupy at most two row bands, each covered by one
band window (see _anchors).  Callers clamp their per-sample steps to smax
(the speed-bucket contract, ops/resample.py:speed_bucket).

Behavioural spec matched: reference src/utils/resampler/cubic.rs:121-142
(Niemitalo x-form expanded to per-tap weights — identical tap values; the
4-term tap summation order differs from the x-form Horner evaluation by
<= a few ulp per sample, same property as hermite_read_mm) and reference
src/source/file/preloaded.rs:270-332 (positions past EOF read zero).

Mosaic-relay constraints that shaped the design (scripts/
probe_mosaic_feats.py, round 5):
  * a trailing dim of 1 is lane-padded to 128 physically, so a
    "values on sublanes" [frames, 1] layout is 128x-wasteful and its DMA
    slices don't lower -> rows of 128 lanes;
  * cross-lane selection (output lane o needs tap lane lo[o]+t) is not a
    native VPU op -> one-hot f32 dots on the MXU;
  * dynamic sublane slices must be 8-aligned (unaligned offsets FAULT the
    TPU worker) -> slice bases are align8 rows, SL covers span + 7 rows;
  * SMEM block shapes must take the trailing two dims whole;
  * scalar VMEM reads are unsupported — scalars stay in SMEM.

Round-5 revision: window DMAs are double-buffered across grid steps (the
next step's DMA descriptor rides a one-step-shifted SMEM operand), hiding
the HBM->VMEM latency each step previously serialized — measured 4.42 ->
3.6 ms on the 1000-grain-stream shape (DMA-bound, few chunks per lane);
the 16-source headline shape is per-group compute-bound and unchanged.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
STRIDE = 124    # samples per row step (4-sample overlap holds any tap quad)
PAD_LEFT = 4    # zero guard samples packed before sample 0
# exact integer div by STRIDE via multiply-shift (Mosaic has no native
# non-pow2 i32 div): floor(i/124) == (i * 8457) >> 20 for 0 <= i < 2*10^5
_DIV_M, _DIV_S = 8457, 20


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def slice_rows(smax: int) -> int:
    """Rows of one group slice: covers a 128-output group cluster
    (spread <= 127*smax + 4 samples) plus taps, anchor margin and the
    <=7-row align8 loss.  Also the bound under which the one-fold-
    per-group argument holds: 127*smax + 8 <= (SL-1)*124 - 1000."""
    sl = 16
    while 127 * int(smax) + 8 > (sl - 1) * STRIDE - 1000:
        sl += 8
    return sl


def window_rows(chunk: int, smax: int) -> int:
    """Rows of one band window: covers every slice anchor of a band
    (anchor spread <= chunk*smax travel) plus a slice + align margins."""
    sl = slice_rows(smax)
    spread = -(-int(chunk) * int(smax) // STRIDE)
    return -(-(spread + sl + 24) // 8) * 8


def pack(buf, min_rows: int = 0):
    """Host-side packing: [..., frames] float -> float32 [..., R, 128]
    overlapped rows (row r = flat samples [124r, 124r+128)), with sample s
    at flat index s + PAD_LEFT: zero guard samples before 0 (taps of
    positions near 0 read zeros without branching) and a zero tail so
    clamped slices/windows stay in range.  ``min_rows`` must be >= the
    window_rows() of the widest (chunk, smax) the buffer will be read
    with."""
    a = np.asarray(buf, np.float32)
    frames = a.shape[-1]
    rows = -(-(frames + PAD_LEFT + 4) // STRIDE) + slice_rows(16) + 8
    rows = max(-(-rows // 8) * 8, int(min_rows))
    flat = np.zeros(a.shape[:-1] + ((rows - 1) * STRIDE + LANE,), np.float32)
    flat[..., PAD_LEFT:PAD_LEFT + frames] = a
    idx = np.arange(rows)[:, None] * STRIDE + np.arange(LANE)[None, :]
    return np.ascontiguousarray(flat[..., idx])


def _weights(frac):
    """Per-tap weights of the Niemitalo Hermite x-form (exact expansion of
    cubic.rs:128-141; identical to ops/resample.hermite_read_mm)."""
    f = frac
    f2 = f * f
    f3 = f2 * f
    w_m1 = f2 - 0.5 * (f + f3)
    w_y0 = 1.0 - 2.5 * f2 + 1.5 * f3
    w_y1 = 0.5 * f + 2.0 * f2 - 1.5 * f3
    w_y2 = 0.5 * (f3 - f2)
    return w_m1, w_y0, w_y1, w_y2


def _align8(r):
    return (r // 8) * 8


def _anchors(kil, sl, wrb, rtot):
    """XLA prolog: per-group slice bases + per-chunk band row windows.

    kil: [b, nc, ngrp, LANE] int32 (clipped leftmost-tap sample indices).

    Within a chunk, positions advance by <= smax per sample except at
    mod-fold jumps, so a group's position values occupy at most two
    clusters (>= 2 folds per group forces the fold interval — and with it
    the whole group span — under 128*smax, i.e. the unwrapped case).
    Slice 1 anchors below the group min, slice 2 (only when the group span
    exceeds one slice's guaranteed coverage) below the group max.  The
    same argument at chunk scale bounds the slice anchors to two row
    bands, each covered by one wrb-row band window.

    Returns (crow [b, nc, 2], brrel [b, nc, ngrp, 2],
             babs [b, nc, ngrp, 2], gwrap [b, nc, ngrp]) — crow absolute
    8-aligned band base rows; brrel slice offsets into the stacked
    [2*wrb] window scratch (band k base = k*wrb); babs absolute slice
    base SAMPLES (base_row * STRIDE)."""
    gmin = jnp.min(kil, axis=-1)
    gmax = jnp.max(kil, axis=-1)
    wrap = (gmax - gmin > (sl - 1) * STRIDE - 1000).astype(jnp.int32)
    br1 = jnp.clip(_align8((jnp.maximum(gmin - 2, 0)) // STRIDE),
                   0, rtot - sl)
    br2 = jnp.clip(_align8((gmax + 4) // STRIDE - sl + 8), 0, rtot - sl)
    br2_used = jnp.where(wrap > 0, br2, br1)
    amin = jnp.min(jnp.minimum(br1, br2_used), axis=-1)
    amax = jnp.max(jnp.maximum(br1, br2_used), axis=-1)
    ca = jnp.clip(amin, 0, rtot - wrb)
    cb = jnp.clip(amax + sl - wrb, 0, rtot - wrb)
    crow = jnp.stack([ca, cb], axis=-1).astype(jnp.int32)

    def rel_of(br):
        hi = br > ca[..., None] + (wrb - sl)  # belongs to band window 1
        base = jnp.where(hi, cb[..., None], ca[..., None])
        rel = jnp.clip(br - base, 0, wrb - sl)
        return rel + jnp.where(hi, wrb, 0)

    brrel = jnp.stack([rel_of(br1), rel_of(br2)], axis=-1).astype(jnp.int32)
    babs = (jnp.stack([br1, br2], axis=-1) * STRIDE).astype(jnp.int32)
    return crow, brrel, babs, wrap


def _read_kernel(c, sl, wrb, ch, b, nc, src_hbm, sdma_ref, sdma_nxt_ref,
                 brrel_ref, babs_ref, gwrap_ref, kil_ref, frac_ref, out_ref,
                 win_ref, sem_ref):
    """One (lane i, chunk j) per grid step, with double-buffered window
    DMAs: step s computes from slot s%2 while slot (s+1)%2 is already
    filling with step s+1's windows.  The NEXT step's DMA descriptor
    (source row + band base rows) arrives as a second, one-step-shifted
    blocked SMEM operand (whole-array SMEM operands overflow SMEM at
    b*nc in the thousands).  Without the prefetch every grid step
    serialized an HBM->VMEM latency before its first dot — comparable to
    the whole compute bill.

    sdma_ref/sdma_nxt_ref: [1, 1, 1, 3] SMEM (src row, band0 row, band1 row)
    for this and the next step; win_ref: VMEM scratch [2, ch, 2*wrb, LANE]
    — two slots of two band windows stacked on the row axis; sem_ref: DMA
    semaphores [2, 2]."""
    ngrp = c // LANE
    i = pl.program_id(0)
    j = pl.program_id(1)
    s_lin = i * nc + j
    slot = jax.lax.rem(s_lin, jnp.int32(2))

    def dma(ref, sslot, band):
        return pltpu.make_async_copy(
            src_hbm.at[ref[0, 0, 0, 0], :,
                       pl.ds(ref[0, 0, 0, 1 + band], wrb), :],
            win_ref.at[sslot, :, pl.ds(band * wrb, wrb), :],
            sem_ref.at[sslot, band])

    @pl.when(s_lin == 0)
    def _():
        dma(sdma_ref, 0, 0).start()
        dma(sdma_ref, 0, 1).start()

    @pl.when(s_lin + 1 < b * nc)
    def _():
        nslot = jax.lax.rem(s_lin + jnp.int32(1), jnp.int32(2))
        dma(sdma_nxt_ref, nslot, 0).start()
        dma(sdma_nxt_ref, nslot, 1).start()

    dma(sdma_ref, slot, 0).wait()
    dma(sdma_ref, slot, 1).wait()
    win2 = win_ref.at[slot]

    sub128 = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
    subsl = jax.lax.broadcasted_iota(jnp.int32, (sl, LANE), 0)
    cut = (sl - 1) * STRIDE + 120  # max covered idx0 (taps fit the slice)

    for g in range(ngrp):
        kil_g = kil_ref[0, 0, g, :]
        frac_g = frac_ref[0, 0, g, :]
        w0, w1, w2, w3 = _weights(frac_g[None, :])  # each [1, LANE]

        def select(band, lane_mask):
            """4-tap weighted select of this group's lanes from ``band``'s
            slice: the overlapped-row packing puts all 4 taps in one row,
            so selection is a single weighted one-hot dot per channel."""
            sl0 = brrel_ref[0, 0, g, band]
            base = babs_ref[0, 0, g, band]
            idx0 = jnp.clip(kil_g - base, 0, cut)[None, :]
            row_a = (idx0 * _DIV_M) >> _DIV_S  # exact idx0 // 124
            lane0 = idx0 - row_a * STRIDE      # 0..123
            d = sub128 - lane0  # [l, o]: tap t of output o sits at d == t
            h = jnp.where(d == 0, w0, 0.0)
            h = jnp.where(d == 1, w1, h)
            h = jnp.where(d == 2, w2, h)
            h = jnp.where(d == 3, w3, h)
            h = h * lane_mask
            ma = (subsl == row_a).astype(jnp.float32)
            outs = []
            for cc in range(ch):
                v = win2[cc, pl.ds(sl0, sl), :]  # [sl, LANE]
                b = jax.lax.dot_general(
                    v, h, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                outs.append(jnp.sum(b * ma, axis=0))  # [LANE]
            return outs

        # exact lane partition: slice 1 takes lanes whose taps it fully
        # covers; slice 2 strictly the rest.  For unwrapped groups every
        # lane satisfies the slice-1 cut and slice 2 never runs.
        m1 = (kil_g - babs_ref[0, 0, g, 0] <= cut)[None, :]
        vals = select(0, m1.astype(jnp.float32))
        for cc in range(ch):
            out_ref[0, cc, pl.ds(g * LANE, LANE)] = vals[cc]

        @pl.when(gwrap_ref[0, 0, 0, g] > 0)
        def _(m1=m1):
            vals2 = select(1, 1.0 - m1.astype(jnp.float32))
            for cc in range(ch):
                cur = out_ref[0, cc, pl.ds(g * LANE, LANE)]
                out_ref[0, cc, pl.ds(g * LANE, LANE)] = cur + vals2[cc]


@functools.partial(jax.jit, static_argnames=("smax", "chunk", "interpret"))
def _ramp_read_call(src, smap, kil, frac, smax, chunk, interpret):
    b, n = kil.shape
    ch = src.shape[1]
    rtot = src.shape[2]
    c = int(chunk)
    sl = slice_rows(smax)
    wrb = window_rows(c, smax)
    if rtot < wrb:
        raise ValueError(
            f"packed buffer too short for the read window: rows={rtot}"
            f" < window_rows={wrb}; pack(min_rows=window_rows(chunk,"
            " smax)) or shrink the chunk")
    nc = n // c
    ngrp = c // LANE

    kil4 = kil.reshape(b, nc, ngrp, LANE)
    frac4 = frac.reshape(b, nc, ngrp, LANE)
    crow, brrel, babs, gwrap = _anchors(kil4, sl, wrb, rtot)

    # per-step DMA descriptor (src row, band0 base row, band1 base row) and
    # its one-step-shifted copy for the double-buffer prefetch
    sdma = jnp.concatenate(
        [jnp.broadcast_to(smap.astype(jnp.int32)[:, None, None], (b, nc, 1)),
         crow], axis=-1)                       # [b, nc, 3]
    flat = sdma.reshape(b * nc, 3)
    sdma_nxt = jnp.concatenate([flat[1:], flat[-1:]]).reshape(b, nc, 1, 3)
    sdma = sdma.reshape(b, nc, 1, 3)

    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_read_kernel, c, sl, wrb, ch, b, nc),
        grid=(b, nc),
        in_specs=[
            # SMEM blocks take the trailing two dims whole (Mosaic: each of
            # the last two block dims must equal the array dim or be 8/128-
            # divisible) — hence the singleton reshapes below.  smap/crow
            # ride whole (unblocked) so the prefetch can address the NEXT
            # grid step's DMA descriptor.
            pl.BlockSpec(memory_space=pl.ANY),  # src [S, ch, R, 128]
            smem((1, 1, 1, 3), lambda i, j: (i, j, 0, 0)),   # sdma
            smem((1, 1, 1, 3), lambda i, j: (i, j, 0, 0)),   # sdma_nxt
            smem((1, 1, ngrp, 2), lambda i, j: (i, j, 0, 0)),
            smem((1, 1, ngrp, 2), lambda i, j: (i, j, 0, 0)),
            smem((1, 1, 1, ngrp), lambda i, j: (i, j, 0, 0)),
            vmem((1, 1, ngrp, LANE), lambda i, j: (i, j, 0, 0)),
            vmem((1, 1, ngrp, LANE), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=vmem((1, ch, c), lambda i, j: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((b, ch, n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, ch, 2 * wrb, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(src, sdma, sdma_nxt, brrel, babs,
      gwrap[:, :, None, :], kil4, frac4)


@functools.lru_cache(maxsize=None)
def _rr_vmappable(smax, chunk, interpret):
    """A custom-vmap wrapper of the kernel call: vmapping a pallas_call
    would try to block the ANY-space source operand per batch lane (which
    Mosaic refuses) — instead fold the outer batch into the kernel's own
    lane dimension B (engine lane banks, BatchedRenderProgram render
    lanes and the multichip dryrun all vmap over this)."""

    @jax.custom_batching.custom_vmap
    def core(src, smap, kil, frac):
        return _ramp_read_call(src, smap, kil, frac, smax, chunk, interpret)

    @core.def_vmap
    def rule(axis_size, in_batched, src, smap, kil, frac):
        src_b, smap_b, kil_b, frac_b = in_batched
        ns = src.shape[1] if src_b else src.shape[0]
        if smap_b:
            smap2 = smap.astype(jnp.int32)
        else:
            smap2 = jnp.broadcast_to(smap.astype(jnp.int32),
                                     (axis_size,) + smap.shape)
        if src_b:
            # per-lane sources: fold lanes into the source table and
            # offset each lane's source ids into its own S-slab
            src2 = src.reshape((axis_size * ns,) + src.shape[2:])
            smap2 = smap2 + (jnp.arange(axis_size, dtype=jnp.int32)[:, None]
                             * ns)
        else:  # shared source table: ids pass through
            src2 = src
        b = kil.shape[-2] if kil_b else kil.shape[0]
        n = kil.shape[-1]
        if not kil_b:
            kil = jnp.broadcast_to(kil, (axis_size,) + kil.shape)
        if not frac_b:
            frac = jnp.broadcast_to(frac, (axis_size,) + frac.shape)
        # recurse through `core` so a further outer vmap folds again
        out = core(
            src2, smap2.reshape(axis_size * b),
            kil.reshape(axis_size * b, n), frac.reshape(axis_size * b, n))
        return out.reshape((axis_size, b) + out.shape[1:]), True

    return core


def ramp_read(src_packed, smap, positions, smax, *, chunk=1024,
              interpret=None):
    """Batched 4-point Hermite read of ramp ``positions``.

    src_packed: [S, ch, R, 128] device array from :func:`pack`.
    smap: [B] int32 — which src_packed row each batch lane reads.
    positions: [B, N] float32 fractional frame positions (post-fold).
    smax: static int per-sample step bound (2**speed_bucket).

    Out-of-range positions return 0 (matching ``hermite_read`` semantics:
    missing taps contribute zeros via the packed guard samples; fully
    out-of-range positions are masked here).  Returns [B, ch, N] float32.
    """
    if interpret is None:
        interpret = not _on_tpu()
    rtot = src_packed.shape[-2]
    pos = jnp.asarray(positions, jnp.float32)
    b, n = pos.shape
    k = jnp.floor(pos)
    frac = pos - k
    kil = k.astype(jnp.int32) - 1 + PAD_LEFT
    lim = (rtot - 1) * STRIDE + 120  # all 4 taps stay inside the last row
    valid = (kil >= 0) & (kil <= lim)
    kil = jnp.clip(kil, 0, lim)

    c = int(min(chunk, -(-n // LANE) * LANE))
    npad = -(-n // c) * c
    if npad != n:
        # edge-pad (NOT zero-pad): zero tails would add a fake low value
        # cluster to the last group, which can push a genuinely folded
        # group to three clusters — beyond the two-slice coverage contract
        kil = jnp.pad(kil, ((0, 0), (0, npad - n)), mode="edge")
        frac = jnp.pad(frac, ((0, 0), (0, npad - n)), mode="edge")
    out = _rr_vmappable(int(smax), c, bool(interpret))(
        src_packed, jnp.asarray(smap, jnp.int32), kil, frac)
    if npad != n:
        out = out[..., :n]
    return out * valid[:, None, :]
