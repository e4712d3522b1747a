"""Grouped-slab chrono window reads vs the plain window read (the delay
effect's hot path; reference src/utils/dsp/delay.rs fractional reads)."""

import numpy as np
import jax.numpy as jnp

from phonic_tpu.ops import chrono as ch


def _oracle(win, offs):
    W = win.shape[-1]
    b = offs.shape[-1]
    oi = np.floor(offs.astype(np.float32))
    of = (offs.astype(np.float32) - oi).astype(np.float32)
    is_int = of == 0
    j = np.arange(b)
    rel = (W + j - oi.astype(np.int64) - np.where(is_int, 0, 1)).astype(int)
    frac = np.where(is_int, of, np.float32(1.0) - of)
    if rel.ndim == 2:  # per-channel offsets
        v1 = np.take_along_axis(win, rel, axis=-1)
        v2 = np.take_along_axis(win, rel + 1, axis=-1)
    else:
        v1 = win[:, rel]
        v2 = win[:, rel + 1]
    return v1 + (v2 - v1) * frac


def test_grouped_matches_plain_slow_offsets():
    rng = np.random.default_rng(5)
    W, b = 4096, 1024
    win = rng.standard_normal((2, W)).astype(np.float32)
    base = rng.uniform(b + 200, W - 300)
    offs = (base + np.cumsum(rng.uniform(-0.9, 0.9, b))).astype(np.float32)
    offs = np.clip(offs, b + 1, W - 2)
    got = np.asarray(ch.read_frac_win_grouped(jnp.asarray(win),
                                              jnp.asarray(offs), 12))
    want = np.asarray(ch.read_frac_win(jnp.asarray(win), jnp.asarray(offs)))
    np.testing.assert_array_equal(got, want)
    np.testing.assert_allclose(got, _oracle(win, offs), rtol=0, atol=2e-6)


def test_grouped_square_lfo_jump_within_slab():
    # square-LFO style offset step INSIDE a 128-output group: both clusters
    # must be covered by one slab as long as the jump fits the slab bound
    rng = np.random.default_rng(6)
    W, b = 8192, 512
    win = rng.standard_normal((2, W)).astype(np.float32)
    offs = np.full(b, 2000.0, np.float32)
    offs[200:] = 2900.0  # ~7-row jump mid-group
    slab = 12  # covers 900-sample jump + group travel
    got = np.asarray(ch.read_frac_win_grouped(jnp.asarray(win),
                                              jnp.asarray(offs), slab))
    np.testing.assert_allclose(got, _oracle(win, offs), rtol=0, atol=2e-6)


def test_grouped_per_channel_offsets():
    rng = np.random.default_rng(7)
    W, b = 4096, 256
    win = rng.standard_normal((2, W)).astype(np.float32)
    offs = np.stack([
        np.clip(1000 + np.cumsum(rng.uniform(-1, 1, b)), b + 1, W - 2),
        np.clip(2000 + np.cumsum(rng.uniform(-1, 1, b)), b + 1, W - 2),
    ]).astype(np.float32)
    got = np.asarray(ch.read_frac_win_grouped(jnp.asarray(win),
                                              jnp.asarray(offs), 10))
    np.testing.assert_allclose(got, _oracle(win, offs), rtol=0, atol=2e-6)


def test_grouped_falls_back_when_slab_covers_window():
    rng = np.random.default_rng(8)
    W, b = 1024, 256
    win = rng.standard_normal((1, W)).astype(np.float32)
    offs = np.clip(rng.uniform(b + 1, W - 2, b), b + 1, W - 2).astype(np.float32)
    got = np.asarray(ch.read_frac_win_grouped(jnp.asarray(win),
                                              jnp.asarray(offs), 99))
    want = np.asarray(ch.read_frac_win(jnp.asarray(win), jnp.asarray(offs)))
    np.testing.assert_array_equal(got, want)
