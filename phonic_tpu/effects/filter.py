"""Multi-channel biquad filter effect (LP / BP / notch / HP).

Behavioural spec: reference src/effect/filter.rs — TPT biquad with
exponentially-scaled cutoff (20 Hz..20 kHz, x^2.5), linearly-smoothed Q, and
per-frame coefficient recomputation while parameters ramp (:160-196).  Here
ramped parameters are just per-sample coefficient arrays feeding the same
parallel scan (ops/filters.tpt_process) — no special ramping path.  Tail:
sample_rate / 10 (:199-204).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..graph.nodes import BuildCtx, Effect
from ..ops import filters
from ..params import EnumParameter, ExponentialScaling, FloatParameter

FILTER_TYPE = EnumParameter(
    "type", "Type", ("Lowpass", "Bandpass", "Bandstop", "Highpass"), "Lowpass"
)
CUTOFF = FloatParameter(
    "cuto", "Cutoff", 20.0, 20000.0, 20000.0, unit="Hz",
    scaling=ExponentialScaling(2.5),
)
Q = FloatParameter("fltq", "Resonance", 0.001, 4.0, 0.707, smoothing="linear")

_TYPE_MAP = (filters.LOWPASS, filters.BANDPASS, filters.NOTCH, filters.HIGHPASS)


class FilterEffect(Effect):
    PARAMS = (FILTER_TYPE, CUTOFF, Q)
    WEIGHT = 2

    def __init__(self, filter_type: str = "Lowpass", cutoff: float = 20000.0,
                 q: float = 0.707, name=None):
        super().__init__(name)
        self.filter_type = filter_type
        self.cutoff = float(cutoff)
        self.q = float(q)

    def param_initials(self):
        return {
            FILTER_TYPE.id: FILTER_TYPE.index_of(self.filter_type),
            CUTOFF.id: self.cutoff,
            Q.id: self.q,
        }

    def batch_key(self, ctx: BuildCtx):
        # process() reads no per-instance statics: any two
        # instances trace identically and can share one vmapped run
        return (type(self).__name__,)

    def init_state(self, ctx: BuildCtx):
        return {"tpt": filters.tpt_state_init((ctx.channels,))}

    def tail_frames(self, ctx: BuildCtx) -> int:
        return ctx.sample_rate // 10

    def process(self, state, x, params, ctx: BuildCtx):
        cutoff = jnp.clip(params[CUTOFF.id], 20.0, ctx.sample_rate / 2.0)
        q = params[Q.id]
        # evaluate all four type variants' output mixes; the integrator core
        # coefficients (a1..a3) are type-independent for these types, so only
        # m0..m2 select on the (stepped) type id -> type changes don't recompile
        base = filters.biquad_coefficients(filters.LOWPASS, ctx.sample_rate, cutoff, q)
        k = 1.0 / q
        one = jnp.ones_like(cutoff)
        zero = jnp.zeros_like(cutoff)
        m_table = {
            filters.LOWPASS: (zero, zero, one),
            filters.BANDPASS: (zero, one, zero),
            filters.NOTCH: (one, -k, zero),
            filters.HIGHPASS: (one, -k, -one),
        }
        t = params[FILTER_TYPE.id][0].astype(jnp.int32)  # block-rate type switch
        m0 = jnp.stack([m_table[n][0] for n in _TYPE_MAP])[t]
        m1 = jnp.stack([m_table[n][1] for n in _TYPE_MAP])[t]
        m2 = jnp.stack([m_table[n][2] for n in _TYPE_MAP])[t]
        coefs = filters.TptCoefficients(base.a1, base.a2, base.a3, m0, m1, m2)
        new_tpt, y = filters.tpt_process(state["tpt"], x, coefs)
        return {"tpt": new_tpt}, y
