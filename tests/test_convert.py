import math

import numpy as np
import jax.numpy as jnp

from phonic_tpu.ops import convert

import reference_dsp as ref


def test_db_linear_roundtrip():
    assert float(convert.linear_to_db(1.0)) == 0.0
    assert float(convert.linear_to_db(0.0)) == -200.0
    assert float(convert.db_to_linear(-200.0)) == 0.0
    assert float(convert.db_to_linear(0.0)) == 1.0
    for db in [-90.0, -20.0, -6.0, 6.0, 20.0]:
        lin = float(convert.db_to_linear(db))
        assert math.isclose(lin, ref.db_to_linear(db), rel_tol=1e-6)
        assert math.isclose(float(convert.linear_to_db(lin)), db, abs_tol=1e-3)
    assert math.isnan(float(convert.linear_to_db(-1.0)))


def test_panning_factors():
    for pan in np.linspace(-1.5, 1.5, 23):
        l, r = convert.panning_factors(pan)
        rl, rr = ref.panning_factors(float(pan))
        assert math.isclose(float(l), rl, abs_tol=1e-6)
        assert math.isclose(float(r), rr, abs_tol=1e-6)
    # centre pan is unity, constant power everywhere
    l, r = convert.panning_factors(0.0)
    assert math.isclose(float(l), 1.0, abs_tol=1e-6)
    assert math.isclose(float(r), 1.0, abs_tol=1e-6)


def test_note_conversions():
    assert math.isclose(float(convert.pitch_from_note(69)), 440.0, rel_tol=1e-6)
    assert math.isclose(float(convert.speed_from_note(60)), 1.0, rel_tol=1e-6)
    assert math.isclose(float(convert.speed_from_note(72)), 2.0, rel_tol=1e-6)
    assert math.isclose(float(convert.speed_from_note(48)), 0.5, rel_tol=1e-6)


def test_vectorized():
    pans = jnp.linspace(-1, 1, 128)
    l, r = convert.panning_factors(pans)
    np.testing.assert_allclose(l**2 + r**2, 2.0, rtol=1e-5)
