"""ops/follower.py: pallas kernels (interpret mode on CPU) vs the XLA scan
and vs a per-sample NumPy oracle (gate.rs:147-195, compressor.rs:283-301)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from phonic_tpu.ops import follower as fo


def _np_follower(x, aa, ra, env0):
    env = np.float32(env0)
    out = np.empty_like(x)
    for i in range(len(x)):
        a = aa[i] if x[i] > env else ra[i]
        env = np.float32(env + a * (x[i] - env))
        out[i] = env
    return env, out


def _np_gate(x, aa, ra, thr, rng, hs, env0, hold0, gain0):
    env, hold, gain = np.float32(env0), np.float32(hold0), np.float32(gain0)
    out = np.empty_like(x)
    for i in range(len(x)):
        a = aa[i] if x[i] > env else ra[i]
        env = np.float32(env + a * (x[i] - env))
        is_open = env >= thr[i]
        target = np.float32(0.0) if (is_open or hold > 0) else rng[i]
        hold = hs[i] if is_open else np.float32(max(hold - 1.0, 0.0))
        a2 = aa[i] if target > gain else ra[i]
        gain = np.float32(gain + a2 * (target - gain))
        out[i] = gain
    return (env, hold, gain), out


def _streams(n, seed=0):
    r = np.random.default_rng(seed)
    x = r.uniform(-90, 0, n).astype(np.float32)
    aa = np.full(n, 0.05, np.float32)
    ra = np.full(n, 0.002, np.float32)
    return x, aa, ra


@pytest.mark.parametrize("n", [4096, 12288])
def test_follower_pallas_matches_oracle(n):
    x, aa, ra = _streams(n)
    env_np, out_np = _np_follower(x, aa, ra, -120.0)
    # the kernel directly (interpret mode on CPU)
    env = fo._follower_call(jnp.asarray(x)[None], jnp.asarray(aa)[None],
                            jnp.asarray(ra)[None],
                            jnp.asarray([-120.0], jnp.float32), 2048)[0]
    np.testing.assert_allclose(np.asarray(env), out_np, atol=2e-4)
    # the XLA path
    env_end2, out2 = fo._follower_xla(jnp.asarray(x), jnp.asarray(aa),
                                      jnp.asarray(ra), jnp.float32(-120.0))
    np.testing.assert_allclose(np.asarray(out2), out_np, atol=2e-4)
    np.testing.assert_allclose(np.asarray(env)[-1], env_np, atol=2e-4)


def test_follower_block_carry_matches_single_run():
    n = 8192
    x, aa, ra = _streams(n, seed=3)
    jx, jaa, jra = map(jnp.asarray, (x, aa, ra))
    whole = fo._follower_call(jx[None], jaa[None], jra[None],
                              jnp.asarray([-120.0], jnp.float32), 2048)[0]
    h = n // 2
    first = fo._follower_call(jx[None, :h], jaa[None, :h], jra[None, :h],
                              jnp.asarray([-120.0], jnp.float32), 2048)[0]
    second = fo._follower_call(jx[None, h:], jaa[None, h:], jra[None, h:],
                               first[-1:], 2048)[0]
    np.testing.assert_array_equal(np.asarray(whole),
                                  np.concatenate([first, second]))


@pytest.mark.parametrize("n", [4096, 12288])
def test_gate_pallas_matches_oracle(n):
    x, aa, ra = _streams(n, seed=1)
    thr = np.full(n, -40.0, np.float32)
    rng = np.full(n, -60.0, np.float32)
    hs = np.full(n, 441.0, np.float32)
    (env_np, hold_np, gain_np), out_np = _np_gate(
        x, aa, ra, thr, rng, hs, -120.0, 0.0, -60.0)
    st0 = jnp.asarray([[-120.0, 0.0, -60.0]], jnp.float32)
    gains, st = fo._gate_call(
        jnp.asarray(x)[None], jnp.asarray(aa)[None], jnp.asarray(ra)[None],
        jnp.asarray(thr)[None], jnp.asarray(rng)[None], jnp.asarray(hs)[None],
        st0, 1024)
    np.testing.assert_allclose(np.asarray(gains)[0], out_np, atol=2e-4)
    np.testing.assert_allclose(np.asarray(st)[0],
                               [env_np, hold_np, gain_np], atol=2e-4)
    # XLA path agrees too
    (e2, h2, g2), out2 = fo._gate_xla(
        jnp.asarray(x), jnp.asarray(aa), jnp.asarray(ra), jnp.asarray(thr),
        jnp.asarray(rng), jnp.asarray(hs), jnp.float32(-120.0),
        jnp.float32(0.0), jnp.float32(-60.0))
    np.testing.assert_allclose(np.asarray(out2), out_np, atol=2e-4)


def test_dispatcher_routes_xla_off_tpu():
    # on CPU the public entry points must use the XLA path (identical values)
    n = 8192
    x, aa, ra = _streams(n, seed=2)
    jx, jaa, jra = map(jnp.asarray, (x, aa, ra))
    env_end, env = fo.asym_follower(jx, jaa, jra, jnp.float32(-120.0))
    env_end2, env2 = fo._follower_xla(jx, jaa, jra, jnp.float32(-120.0))
    np.testing.assert_array_equal(np.asarray(env), np.asarray(env2))
