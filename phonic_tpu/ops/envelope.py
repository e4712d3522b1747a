"""Attack/release envelope follower (used by gate + compressor detectors).

Behavioural spec: reference src/utils/dsp/envelope.rs — a one-pole smoother
whose coefficient switches between attack and release depending on whether
the input is above or below the current envelope:

    y[n] = x[n] + coef * (y[n-1] - x[n]),  coef = attack if x[n] > y[n-1]
                                                  else release

The branch depends on the running state, so this is the one recurrence in
the suite that is *not* associative-scannable exactly.  We run a sequential
``lax.scan`` with heavy unrolling; the state is a scalar per lane, so the
cost is dominated by loop overhead, and wide batches (channels x stems)
amortise it.  (Candidate for a Pallas kernel if profiling says so.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def follower_coef(time_secs, sample_rate: int, dtype=jnp.float32):
    """coef = exp(-1 / (t * sr)); 0 when t <= 0
    (reference: src/utils/dsp/envelope.rs:27-41).  Coefficients this close
    to 1 lose ~half their distance-to-1 precision in f32; pass
    dtype=float64 for strict-parity followers, or use ``follower_alpha``
    (the 1-coef form) which keeps full relative precision in f32."""
    t = jnp.asarray(time_secs, dtype)
    return jnp.where(t > 0.0, jnp.exp(-1.0 / jnp.maximum(t * float(sample_rate), 1e-9)), 0.0)


def follower_alpha(time_secs, sample_rate: int, dtype=jnp.float32):
    """a = 1 - coef computed directly as -expm1(-1/(t*sr)): representing the
    small step a keeps ~eps relative precision where storing coef loses
    eps/(1-coef) (the update env += a*(x-env) is algebraically identical to
    env = x + coef*(env-x)).  a = 1 (instant) when t <= 0."""
    t = jnp.asarray(time_secs, dtype)
    return jnp.where(
        t > 0.0, -jnp.expm1(-1.0 / jnp.maximum(t * float(sample_rate), 1e-9)),
        1.0)


def follower_block(y0, x, attack_coef, release_coef, axis: int = -1, unroll: int = 64):
    """Run the follower over a block.  x: samples along ``axis`` with any
    leading batch dims; y0: state shaped like x without the sample axis.
    Returns (y_end, y)."""
    x = jnp.asarray(x)
    xm = jnp.moveaxis(x, axis, 0)
    attack_coef = jnp.asarray(attack_coef, x.dtype)
    release_coef = jnp.asarray(release_coef, x.dtype)

    def step(y, xn):
        coef = jnp.where(xn > y, attack_coef, release_coef)
        y = xn + coef * (y - xn)
        return y, y

    y_end, ym = jax.lax.scan(step, jnp.broadcast_to(jnp.asarray(y0, x.dtype), xm.shape[1:]), xm, unroll=unroll)
    return y_end, jnp.moveaxis(ym, 0, axis)
