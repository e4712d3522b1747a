"""Gain effect with optional DC filtering.

Behavioural spec: reference src/effect/gain.rs — exponentially smoothed
linear gain (displayed -60..+24 dB) plus an optional one-pole DC blocker
(Off / Slow ~1 Hz / Default ~5 Hz / Fast ~20 Hz, :21-46, 143-163).
N-channel capable.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..graph.nodes import BuildCtx, Effect
from ..ops import filters
from ..params import DecibelScaling, EnumParameter, FloatParameter, format_gain

GAIN = FloatParameter(
    "GAIN", "Gain", 0.0, 15.848932, 1.0, scaling=DecibelScaling(-60.0, 24.0),
    formatter=format_gain,
)
DC_MODE = EnumParameter("DCFL", "DC Filter", ("Off", "Slow", "Default", "Fast"), "Off")

_DC_HZ = {"Slow": "slow", "Default": "default", "Fast": "fast"}


class GainEffect(Effect):
    PARAMS = (GAIN, DC_MODE)
    WEIGHT = 1

    def __init__(self, gain: float = 1.0, dc_mode: str = "Off", name=None):
        super().__init__(name)
        self.gain = float(gain)
        self.dc_mode = dc_mode

    def param_initials(self):
        return {GAIN.id: self.gain, DC_MODE.id: DC_MODE.index_of(self.dc_mode)}

    def batch_key(self, ctx: BuildCtx):
        # process() reads no per-instance statics: any two
        # instances trace identically and can share one vmapped run
        return (type(self).__name__,)

    def init_state(self, ctx: BuildCtx):
        return {"dc": filters.dc_state_init((ctx.channels,))}

    def process(self, state, x, params, ctx: BuildCtx):
        y = x * params[GAIN.id][None, :]
        # DC mode is a stepped enum; evaluate all three coefficients and
        # select — keeps mode switches recompile-free
        mode = params[DC_MODE.id][0].astype(jnp.int32)  # block-rate is enough
        rs = jnp.stack(
            [jnp.float32(1.0)]
            + [jnp.float32(filters.dc_coefficient(ctx.sample_rate, m))
               for m in ("slow", "default", "fast")]
        )
        r = rs[jnp.clip(mode, 0, 3)]
        dc_state, filtered = filters.dc_process(state["dc"], y, r)
        y = jnp.where(mode > 0, filtered, y)
        # keep the DC state zeroed while bypassed so enabling it starts clean
        dc_state = filters.DcState(
            y1=jnp.where(mode > 0, dc_state.y1, 0.0),
            x1=jnp.where(mode > 0, dc_state.x1, 0.0),
        )
        return {"dc": dc_state}, y
