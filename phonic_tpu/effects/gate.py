"""Stereo noise gate with hold and configurable floor.

Behavioural spec: reference src/effect/gate.rs — per-frame stereo peak ->
dB-domain envelope follower -> open/hold/closed state machine -> one-pole
dB-domain gain smoothing with attack/release asymmetry (:147-195); gains
<= -60 dB snap to 0.  Tail: hold + release samples.

The gate's per-sample state (envelope, hold counter, gain dB) is genuinely
sequential with data-dependent branching, so this runs as ONE fused
``lax.scan`` carrying all three scalars per lane; detector math
(peak -> dB) is precomputed vectorised outside the scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..graph.nodes import BuildCtx, Effect
from ..ops import follower as follower_ops
from ..ops.envelope import follower_alpha
from ..params import FloatParameter, format_db

THRESHOLD = FloatParameter("thrs", "Threshold", -60.0, 0.0, -30.0, unit="dB", smoothing=None)
ATTACK = FloatParameter("attk", "Attack", 0.001, 0.5, 0.005, unit="s", smoothing=None)
HOLD = FloatParameter("hold", "Hold", 0.0, 2.0, 0.1, unit="s", smoothing=None)
RELEASE = FloatParameter("rels", "Release", 0.01, 2.0, 0.2, unit="s", smoothing=None)
RANGE = FloatParameter("rnge", "Range", -60.0, 0.0, -60.0, formatter=format_db, smoothing=None)

_LN10_20 = 20.0 / 2.302585092994046


class GateEffect(Effect):
    PARAMS = (THRESHOLD, ATTACK, HOLD, RELEASE, RANGE)
    WEIGHT = 2

    def __init__(self, threshold: float = -30.0, attack: float = 0.005,
                 hold: float = 0.1, release: float = 0.2, range_db: float = -60.0,
                 name=None):
        super().__init__(name)
        self.threshold = float(threshold)
        self.attack = float(attack)
        self.hold = float(hold)
        self.release = float(release)
        self.range_db = float(range_db)

    def param_initials(self):
        return {
            THRESHOLD.id: self.threshold, ATTACK.id: self.attack,
            HOLD.id: self.hold, RELEASE.id: self.release, RANGE.id: self.range_db,
        }

    def batch_key(self, ctx: BuildCtx):
        # process() reads no per-instance statics: any two
        # instances trace identically and can share one vmapped run
        return (type(self).__name__,)

    def init_state(self, ctx: BuildCtx):
        dt = ctx.scan_dtype
        return {
            "env": jnp.asarray(-120.0, dt),
            "hold": jnp.asarray(0.0, dt),
            "gain_db": jnp.asarray(self.range_db, dt),
        }

    def tail_frames(self, ctx: BuildCtx) -> int:
        return int((self.hold + self.release) * ctx.sample_rate) + 1

    def max_tail_frames(self, ctx: BuildCtx) -> int:
        # HOLD/RELEASE are automatable up to their range maxima
        return int((HOLD.max + RELEASE.max) * ctx.sample_rate) + 1

    def process(self, state, x, params, ctx: BuildCtx):
        if ctx.channels != 2:
            raise ValueError("GateEffect only supports stereo I/O")
        sr = ctx.sample_rate
        dt = ctx.scan_dtype
        threshold = params[THRESHOLD.id]
        range_db = params[RANGE.id]
        attack_a = follower_alpha(params[ATTACK.id], sr, dtype=dt)
        release_a = follower_alpha(params[RELEASE.id], sr, dtype=dt)
        hold_samples = jnp.floor(params[HOLD.id] * sr)

        peak = jnp.maximum(jnp.abs(x[0]), jnp.abs(x[1])).astype(dt)
        input_db = jnp.where(peak > 1e-6, _LN10_20 * jnp.log(jnp.maximum(peak, 1e-7)), -120.0)

        bc = lambda v: jnp.broadcast_to(v, input_db.shape).astype(dt)
        (env, hold, gain_db), gains_db = follower_ops.gate_machine(
            bc(input_db), bc(attack_a), bc(release_a), bc(threshold),
            bc(range_db), bc(hold_samples),
            state["env"], state["hold"], state["gain_db"],
        )
        gain = jnp.where(gains_db <= -60.0, 0.0, jnp.exp(gains_db / _LN10_20))
        gain = jnp.where(gains_db == 0.0, 1.0, gain).astype(x.dtype)
        y = x * gain[None, :]
        return {"env": env, "hold": hold, "gain_db": gain_db}, y
