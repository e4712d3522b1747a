"""ops/rampread.py: the fused Pallas ramp-read vs the hermite_read oracle.

Runs the kernel in interpret mode on CPU (tests/conftest.py forces the CPU
platform).  The kernel must match ``hermite_read`` to tap-summation
rounding (<= a few ulp) for any position stream honoring the step
contract, including loop/pingpong folds, reverse ramps and out-of-range
positions (reference semantics: src/utils/resampler/cubic.rs:121-142,
src/source/file/preloaded.rs:270-332).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from phonic_tpu.ops import rampread as rr
from phonic_tpu.ops.resample import hermite_read

TOL = 1e-5


def _read_ref(src, smap, pos):
    return np.stack([
        np.asarray(hermite_read(jnp.asarray(src[smap[b]]),
                                jnp.asarray(pos[b])))
        for b in range(pos.shape[0])
    ])


def test_matches_hermite_read_basic():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(3, 2, 9000)).astype(np.float32)
    packed = jnp.asarray(rr.pack(src, min_rows=rr.window_rows(1024, 2)))
    smap = np.array([0, 1, 2, 0], np.int32)
    pos = np.cumsum(rng.uniform(0.2, 2.0, (4, 4096)), -1).astype(np.float32)
    pos += rng.uniform(0, 100, (4, 1)).astype(np.float32)
    out = np.asarray(rr.ramp_read(packed, smap, jnp.asarray(pos), smax=2,
                                  interpret=True))
    assert np.abs(out - _read_ref(src, smap, pos)).max() <= TOL


def test_out_of_range_positions_read_zero():
    rng = np.random.default_rng(1)
    src = rng.normal(size=(1, 1, 2000)).astype(np.float32)
    packed = jnp.asarray(rr.pack(src, min_rows=rr.window_rows(1024, 2)))
    pos = np.linspace(-40.0, 2040.0, 1500, dtype=np.float32)[None]
    out = np.asarray(rr.ramp_read(packed, np.zeros(1, np.int32),
                                  jnp.asarray(pos), smax=2, interpret=True))
    ref = _read_ref(src, [0], pos)
    assert np.abs(out - ref).max() <= TOL
    # fully out of range -> exactly zero
    assert np.all(out[0, 0, pos[0] < -3.0] == 0.0)
    assert np.all(out[0, 0, pos[0] > 2002.0] == 0.0)


@pytest.mark.parametrize("kind", ["forward", "loop_short", "loop_long",
                                  "pingpong", "reverse"])
def test_folds_and_direction(kind):
    rng = np.random.default_rng(hash(kind) % 2**32)
    frames = 3000
    src = rng.normal(size=(1, 1, frames)).astype(np.float32)
    packed = jnp.asarray(rr.pack(src, min_rows=rr.window_rows(1024, 4)))
    n = 5000
    steps = rng.uniform(0.1, 4.0, n)
    if kind == "reverse":
        p = 2900.0 - np.cumsum(steps) * 0.2
    else:
        p = np.cumsum(steps) + 10.0
    if kind == "loop_short":
        ls, le = 500.0, 800.0  # shorter than a chunk's travel
        p = np.where(p < ls, p, ls + np.mod(p - ls, le - ls))
    elif kind == "loop_long":
        ls, le = 100.0, 2900.0
        p = np.where(p < ls, p, ls + np.mod(p - ls, le - ls))
    elif kind == "pingpong":
        ls, le = 200.0, 1400.0
        c = np.mod(p - ls, 2 * (le - ls))
        p = np.where(p < ls, p,
                     ls + np.where(c < le - ls, c, 2 * (le - ls) - c))
    pos = p[None].astype(np.float32)
    out = np.asarray(rr.ramp_read(packed, np.zeros(1, np.int32),
                                  jnp.asarray(pos), smax=4, interpret=True))
    assert np.abs(out - _read_ref(src, [0], pos)).max() <= TOL


def test_ragged_length_and_small_n():
    # n not a multiple of the chunk, including n < one lane group; the
    # edge-padding must not corrupt folded last groups
    rng = np.random.default_rng(2)
    frames = 700
    src = rng.normal(size=(1, 1, frames)).astype(np.float32)
    packed = jnp.asarray(rr.pack(src, min_rows=rr.window_rows(1024, 4)))
    for n in (1, 37, 100, 129, 1000, 2049):
        p = np.cumsum(rng.uniform(0.1, 4.0, n)) + 300.0
        ls, le = 100.0, 620.0
        p = np.where(p < ls, p, ls + np.mod(p - ls, le - ls))
        pos = p[None].astype(np.float32)
        out = np.asarray(rr.ramp_read(packed, np.zeros(1, np.int32),
                                      jnp.asarray(pos), smax=4,
                                      interpret=True))
        assert np.abs(out - _read_ref(src, [0], pos)).max() <= TOL, n


def test_fuzz_folds():
    rng = np.random.default_rng(3)
    frames = 700
    src = rng.normal(size=(2, 1, frames)).astype(np.float32)
    packed = jnp.asarray(rr.pack(src, min_rows=rr.window_rows(1024, 4)))
    for trial in range(12):
        n = int(rng.integers(40, 3000))
        kind = trial % 3
        steps = rng.uniform(-4, 4, n) if kind == 0 else rng.uniform(0.1, 4, n)
        p = np.cumsum(steps) + rng.uniform(-5, 700)
        if kind == 1:
            ls = rng.uniform(0, 300)
            le = ls + rng.uniform(30, 5000)
            p = np.where(p < ls, p, ls + np.mod(p - ls, le - ls))
        elif kind == 2:
            ls = rng.uniform(0, 300)
            le = ls + rng.uniform(30, 2000)
            c = np.mod(p - ls, 2 * (le - ls))
            p = np.where(p < ls, p,
                         ls + np.where(c < le - ls, c, 2 * (le - ls) - c))
        pos = p[None].astype(np.float32)
        smap = np.array([trial % 2], np.int32)
        out = np.asarray(rr.ramp_read(packed, smap, jnp.asarray(pos),
                                      smax=4, interpret=True))
        err = np.abs(out - _read_ref(src, smap, pos)).max()
        assert err <= TOL, (trial, n, kind, err)


def test_multi_source_batch_and_stereo():
    rng = np.random.default_rng(4)
    src = rng.normal(size=(4, 2, 5000)).astype(np.float32)
    packed = jnp.asarray(rr.pack(src, min_rows=rr.window_rows(1024, 1)))
    smap = np.array([2, 0, 3, 1, 2, 2], np.int32)
    pos = (np.cumsum(rng.uniform(0.3, 1.0, (6, 3000)), -1)
           + rng.uniform(0, 1000, (6, 1))).astype(np.float32)
    out = np.asarray(rr.ramp_read(packed, smap, jnp.asarray(pos), smax=1,
                                  interpret=True))
    assert out.shape == (6, 2, 3000)
    assert np.abs(out - _read_ref(src, smap, pos)).max() <= TOL


def test_vmap_folds_into_kernel_lanes():
    """vmapping ramp_read (lane banks, BatchedRenderProgram, the multichip
    dryrun) must fold the batch into the kernel's own B dim via the
    custom-vmap rule — pallas ANY-space operands cannot be blocked per
    lane.  Covers shared + per-lane sources and nesting."""
    import jax

    rng = np.random.default_rng(9)
    src = rng.normal(size=(2, 1, 3000)).astype(np.float32)
    packed = jnp.asarray(rr.pack(src, min_rows=rr.window_rows(1024, 2)))
    pos = (np.cumsum(rng.uniform(0.2, 2.0, (3, 4, 1000)), -1)
           + rng.uniform(0, 50, (3, 4, 1))).astype(np.float32)
    smap = np.array([0, 1, 0, 1], np.int32)
    ref = np.stack([_read_ref(src, smap, pos[sl]) for sl in range(3)])

    out = np.asarray(jax.vmap(lambda p: rr.ramp_read(
        packed, smap, p, smax=2, interpret=True))(jnp.asarray(pos)))
    assert np.abs(out - ref).max() <= TOL

    packed_b = jnp.stack([packed, packed * 2.0])
    out2 = np.asarray(jax.vmap(lambda pk, p: rr.ramp_read(
        pk, smap, p, smax=2, interpret=True))(packed_b, jnp.asarray(pos[:2])))
    assert np.abs(out2[0] - ref[0]).max() <= TOL
    assert np.abs(out2[1] - 2.0 * ref[1]).max() <= 2 * TOL

    out3 = np.asarray(jax.vmap(jax.vmap(lambda p: rr.ramp_read(
        packed, smap, p, smax=2, interpret=True)))(
            jnp.asarray(pos[:, None])))
    assert np.abs(out3[:, 0] - ref).max() <= TOL
