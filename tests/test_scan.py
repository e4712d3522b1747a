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


def test_chunked_first_matches_associative():
    """The two-level chunked evaluation (routed for T >= _CHUNKED_MIN_T)
    agrees with the associative scan and a float64 oracle, including
    non-multiple-of-L lengths, batch dims and axis moves."""
    rng = np.random.default_rng(3)
    for t in (4096, 6000, 131072):
        a = rng.uniform(-0.999, 0.999, (2, t)).astype(np.float32)
        b = rng.normal(size=(2, t)).astype(np.float32)
        y0 = rng.normal(size=2).astype(np.float32)
        y_chunked = np.asarray(scan._chunked_first(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(y0)))
        y_ref = np.asarray(scan.linear_recurrence_reference(a, b, y0))
        scale = np.abs(y_ref).max() + 1e-9
        assert np.abs(y_chunked - y_ref).max() / scale < 1e-6
        # public entry routes through the chunked path at these sizes
        y_pub = np.asarray(scan.linear_recurrence(a, b, y0))
        np.testing.assert_array_equal(y_pub, y_chunked)


def test_chunked_second_matches_oracle():
    rng = np.random.default_rng(4)
    t = 8192
    g = rng.uniform(0.01, 1.0, (2, t))
    k = rng.uniform(0.1, 2.0, (2, t))
    a1 = 1.0 / (1.0 + g * (g + k))
    a2 = g * a1
    a3 = g * a2
    x = rng.normal(size=(2, t))
    A11, A12, A21, A22 = 2 * a1 - 1, -2 * a2, 2 * a2, 1 - 2 * a3
    b1, b2 = 2 * a2 * x, 2 * a3 * x
    s01 = rng.normal(size=2)
    s02 = rng.normal(size=2)

    s1, s2 = scan.linear_recurrence_2(
        *[jnp.asarray(v, jnp.float32) for v in (A11, A12, A21, A22, b1, b2)],
        jnp.asarray(s01, jnp.float32), jnp.asarray(s02, jnp.float32))

    c1, c2 = s01.copy(), s02.copy()
    o1 = np.empty((2, t))
    o2 = np.empty((2, t))
    for n in range(t):
        n1 = A11[:, n] * c1 + A12[:, n] * c2 + b1[:, n]
        n2 = A21[:, n] * c1 + A22[:, n] * c2 + b2[:, n]
        c1, c2 = n1, n2
        o1[:, n] = n1
        o2[:, n] = n2
    scale = max(np.abs(o1).max(), np.abs(o2).max())
    assert np.abs(np.asarray(s1) - o1).max() / scale < 1e-6
    assert np.abs(np.asarray(s2) - o2).max() / scale < 1e-6


def test_chunked_under_vmap():
    import jax

    rng = np.random.default_rng(5)
    a = rng.uniform(0.5, 0.999, (4, 3, 4096)).astype(np.float32)
    b = rng.normal(size=(4, 3, 4096)).astype(np.float32)
    y0 = rng.normal(size=(4, 3)).astype(np.float32)
    y_v = jax.vmap(scan.linear_recurrence)(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(y0))
    y_d = scan.linear_recurrence(jnp.asarray(a), jnp.asarray(b), jnp.asarray(y0))
    np.testing.assert_allclose(np.asarray(y_v), np.asarray(y_d), atol=1e-5)
