import numpy as np
import jax.numpy as jnp

from phonic_tpu.ops import scan


def test_linear_recurrence_matches_sequential():
    rng = np.random.default_rng(0)
    n = 4096
    a = rng.uniform(0.5, 0.999, n).astype(np.float32)
    b = rng.normal(size=n).astype(np.float32)
    y0 = np.float32(0.3)

    y_par = np.asarray(scan.linear_recurrence(a, b, y0))
    y_seq = np.asarray(scan.linear_recurrence_reference(a, b, y0))
    np.testing.assert_allclose(y_par, y_seq, rtol=1e-4, atol=1e-5)

    # exact NumPy float64 oracle
    y = np.float64(y0)
    out = np.empty(n)
    for i in range(n):
        y = a[i] * y + b[i]
        out[i] = y
    np.testing.assert_allclose(y_par, out, rtol=1e-3, atol=1e-4)


def test_linear_recurrence_batched_axis():
    rng = np.random.default_rng(1)
    a = rng.uniform(0.9, 0.99, (3, 256)).astype(np.float32)
    b = rng.normal(size=(3, 256)).astype(np.float32)
    y0 = np.zeros(3, np.float32)
    y = scan.linear_recurrence(a, b, y0)
    assert y.shape == (3, 256)
    y_t = scan.linear_recurrence(a.T, b.T, y0, axis=0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_t).T, rtol=1e-5)


def test_second_order_recurrence():
    rng = np.random.default_rng(2)
    n = 2048
    # A stable time-varying 2x2 system (companion form of a biquad).
    a1 = rng.uniform(-1.2, -0.8, n)
    a2 = rng.uniform(0.3, 0.6, n)
    f = rng.normal(size=n)

    s1, s2 = scan.linear_recurrence_2(
        jnp.asarray(-a1, jnp.float32),
        jnp.asarray(-a2, jnp.float32),
        jnp.ones(n, jnp.float32),
        jnp.zeros(n, jnp.float32),
        jnp.asarray(f, jnp.float32),
        jnp.zeros(n, jnp.float32),
        0.1,
        -0.2,
    )
    # float64 oracle
    v = np.array([0.1, -0.2])
    out = np.empty(n)
    for i in range(n):
        A = np.array([[-a1[i], -a2[i]], [1.0, 0.0]])
        v = A @ v + np.array([f[i], 0.0])
        out[i] = v[0]
    np.testing.assert_allclose(np.asarray(s1), out, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s2)[1:], out[:-1], rtol=1e-3, atol=1e-4)
