"""The gather-free granular reads must reproduce the gather formulation
exactly: _source_read_mm vs the 4-tap Catmull-Rom gather (incl. global
wrap, loop folds, reverse reads, mid-chunk triggers) and _window_env_mm vs
window_sample."""

import numpy as np
import jax.numpy as jnp
import pytest

from phonic_tpu.generators import granular as gr


def _gather_cr(mono, fidx):
    frames = mono.shape[0]
    i1 = np.minimum(fidx.astype(np.int32), frames - 1)
    frac = (fidx - i1).astype(np.float32)
    i0 = np.where(i1 > 0, i1 - 1, frames - 1)
    i2 = np.where(i1 < frames - 1, i1 + 1, 0)
    i3 = np.where(i2 < frames - 1, i2 + 1, 0)
    y0, y1, y2, y3 = mono[i0], mono[i1], mono[i2], mono[i3]
    a = -0.5 * y0 + 1.5 * y1 - 1.5 * y2 + 0.5 * y3
    b = y0 - 2.5 * y1 + 2.0 * y2 - 0.5 * y3
    c = -0.5 * y0 + 0.5 * y2
    return ((a * frac + b) * frac + c) * frac + y1


def _run_case(frames, n, pos0, inc, loop, ls=0.2, le=0.7, first=None):
    rng = np.random.default_rng(1)
    mono = rng.uniform(-1, 1, frames).astype(np.float32)
    g = len(pos0)
    j = np.arange(n, dtype=np.float32)
    pos_u = np.asarray(pos0, np.float32)[:, None] + \
        j[None, :] * np.asarray(inc, np.float32)[:, None]
    ll = np.float32(max(le - ls, 1e-9))
    folded = ls + np.mod(pos_u - ls, ll)
    pos = np.where(np.asarray(loop, bool)[:, None], folded, np.mod(pos_u, 1.0))
    fidx = (pos * np.float32(frames - 1)).astype(np.float32)

    span = int(np.ceil(n * 4.0)) + 8
    lf = np.float32(frames - 1)
    first_j = np.zeros(g, np.int32) if first is None else np.asarray(first, np.int32)
    got = gr._source_read_mm(
        gr.source_ext(jnp.asarray(mono), span), frames, jnp.asarray(fidx),
        d=jnp.asarray(inc, jnp.float32) * lf,
        loop_s=jnp.where(jnp.asarray(loop, bool), ls, 0.0) * lf,
        loop_len=jnp.where(jnp.asarray(loop, bool), ll, 1.0) * lf,
        first_j=jnp.asarray(first_j), span=span)
    want = _gather_cr(mono, fidx)
    mask = np.ones((g, n), bool)
    if first is not None:
        mask = j[None, :] >= first_j[:, None]
    err = np.abs(np.asarray(got) - want)[mask].max()
    assert err < 1e-5, err


def test_plain_ramps_match_gather():
    _run_case(9000, 512, pos0=[0.1, 0.45, 0.8], inc=[0.9 / 9000, 2.0 / 9000,
                                                     0.3 / 9000],
              loop=[False, False, False])


def test_global_wrap_matches_gather():
    # positions run off the end of the file and wrap to the head mid-chunk
    _run_case(4000, 512, pos0=[0.95, 0.999], inc=[2.0 / 4000, 3.5 / 4000],
              loop=[False, False])


def test_reverse_and_left_wrap():
    _run_case(4000, 512, pos0=[0.05, 0.3], inc=[-2.0 / 4000, -0.5 / 4000],
              loop=[False, False])


def test_loop_fold_short_and_long():
    # short loop (multiple folds per chunk) and long loop (single fold)
    _run_case(16000, 512, pos0=[0.21, 0.3], inc=[3.0 / 16000, 2.0 / 16000],
              loop=[True, True], ls=0.2, le=0.215)
    _run_case(16000, 512, pos0=[0.68, 0.25], inc=[2.0 / 16000, -2.0 / 16000],
              loop=[True, True], ls=0.2, le=0.7)


def test_mid_chunk_trigger_anchor():
    # the grain becomes live at sample 300; earlier samples are masked
    _run_case(6000, 512, pos0=[0.5], inc=[1.5 / 6000], loop=[False],
              first=[300])


@pytest.mark.parametrize("mode", range(8))
def test_window_env_matches_lut(mode):
    rng = np.random.default_rng(mode)
    phase = rng.uniform(-0.1, 1.1, (3, 700)).astype(np.float32)
    wmode = np.full((3,), mode, np.int32)
    got = gr._window_env_mm(jnp.asarray(wmode), jnp.asarray(phase))
    want = gr.window_sample(
        jnp.broadcast_to(jnp.asarray(wmode)[:, None], phase.shape),
        jnp.asarray(phase))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)
