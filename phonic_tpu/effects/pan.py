"""Stereo panning effect: phase invert -> mid/side width -> constant-power pan.

Behavioural spec: reference src/effect/pan.rs (processing order :113-160;
stereo-only).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..graph.nodes import BuildCtx, Effect
from ..ops.convert import panning_factors
from ..params import BooleanParameter, FloatParameter, format_pan, format_percent

PAN = FloatParameter("pan ", "Pan", -1.0, 1.0, 0.0, formatter=format_pan)
WIDTH = FloatParameter("wdth", "Width", 0.0, 2.0, 1.0, formatter=format_percent)
INVERT_L = BooleanParameter("invl", "Invert L", False)
INVERT_R = BooleanParameter("invr", "Invert R", False)


class PanningEffect(Effect):
    PARAMS = (PAN, WIDTH, INVERT_L, INVERT_R)
    WEIGHT = 1

    def __init__(self, pan: float = 0.0, width: float = 1.0,
                 invert_l: bool = False, invert_r: bool = False, name=None):
        super().__init__(name)
        self.pan = float(pan)
        self.width = float(width)
        self.invert_l = bool(invert_l)
        self.invert_r = bool(invert_r)

    def param_initials(self):
        return {
            PAN.id: self.pan, WIDTH.id: self.width,
            INVERT_L.id: 1.0 if self.invert_l else 0.0,
            INVERT_R.id: 1.0 if self.invert_r else 0.0,
        }

    def batch_key(self, ctx: BuildCtx):
        # process() reads no per-instance statics: any two
        # instances trace identically and can share one vmapped run
        return (type(self).__name__,)

    def process(self, state, x, params, ctx: BuildCtx):
        if ctx.channels != 2:
            raise ValueError("PanningEffect only supports stereo I/O")
        inv_l = jnp.where(params[INVERT_L.id] >= 0.5, -1.0, 1.0)
        inv_r = jnp.where(params[INVERT_R.id] >= 0.5, -1.0, 1.0)
        l = x[0] * inv_l
        r = x[1] * inv_r
        width = params[WIDTH.id]
        mid = (l + r) * 0.5
        side = (l - r) * 0.5
        apply_w = jnp.abs(width - 1.0) > 1e-6
        l = jnp.where(apply_w, mid + side * width, l)
        r = jnp.where(apply_w, mid - side * width, r)
        pan = params[PAN.id]
        pl, pr = panning_factors(pan)
        apply_p = jnp.abs(pan) > 1e-6
        l = jnp.where(apply_p, l * pl, l)
        r = jnp.where(apply_p, r * pr, r)
        return state, jnp.stack([l, r])
