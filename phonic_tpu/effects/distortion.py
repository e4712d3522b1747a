"""Multi-channel distortion: 5 waveshapers with RMS gain compensation.

Behavioural spec: reference src/effect/distortion.rs — SoftClip (cubic),
HardClip, Diode (Shockley + atan), Fuzz (exp saturate + half-wave rectify),
Fold (wavefolder) (:124-188); drive 0..4 linear-smoothed (step 0.01), mix
exponentially smoothed (inertia 0.1); RMS compensation from a host-built
256-entry LUT per type, probed with a 5-partial test signal (:84-121).

Memoryless and fully elementwise on TPU; the waveshaper id is a traced
int32 (type switches don't recompile — all five shapes evaluate and select,
which XLA fuses into one pass).
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np
import jax.numpy as jnp

from ..graph.nodes import BuildCtx, Effect
from ..params import EnumParameter, FloatParameter, format_percent

MAX_DRIVE = 4.0
_LUT_SIZE = 256

DIST_TYPE = EnumParameter(
    "type", "Type", ("SoftClip", "HardClip", "Diode", "Fuzz", "Fold"), "Diode"
)
DRIVE = FloatParameter(
    "driv", "Drive", 0.0, MAX_DRIVE, 0.0, unit="x", smoothing="linear",
    smoothing_arg=0.01,
)
MIX = FloatParameter(
    "mix ", "Mix", 0.0, 1.0, 1.0, formatter=format_percent,
    smoothing="exponential", smoothing_arg=0.1,
)


def soft_clip(x, drive):
    t = drive / MAX_DRIVE
    gain = 1.0 + t * t * (15.0 - 1.0)
    xg = x * gain
    shaped = 1.5 * (xg - xg**3 / 3.0)
    shaped = jnp.where(gain <= 1.0, x, shaped)
    return jnp.where(xg >= 1.0, 1.0, jnp.where(xg > -1.0, shaped, -1.0))


def hard_clip(x, drive):
    t = drive / MAX_DRIVE
    gain = 1.0 + t * t * (25.0 - 1.0)
    thr = 1.0 / gain
    return jnp.clip(x, -thr, thr) * gain


def diode(x, drive):
    t = drive / MAX_DRIVE
    curve = 0.6 * t * t + 0.4 * t
    gain = 1.0 + curve * (20.0 - 1.0)
    d = jnp.exp((0.1 * x) / (0.0253 * 1.68)) - 1.0
    return 2.0 / math.pi * jnp.arctan(d * gain)


def fuzz(x, drive):
    t = drive / MAX_DRIVE
    gain = 1.0 + (1.0 - jnp.exp(-3.0 * t)) * (30.0 - 1.0)
    amp = x * gain
    sat = jnp.sign(amp) * (1.0 - jnp.exp(-jnp.abs(amp)))
    # reference treats exactly 0 as the positive branch
    sat = jnp.where(amp == 0.0, 0.0, sat)
    return 1.5 * (sat + jnp.abs(sat))


def fold(x, drive):
    t = drive / MAX_DRIVE
    gain = 1.0 + t * t * (4.0 - 1.0)
    xg = x * gain
    thr = 1.0 / gain
    folded = jnp.abs(jnp.mod(jnp.abs(xg - thr), thr * 4.0) - thr * 2.0) - thr
    return jnp.where(jnp.abs(xg) > thr, folded, xg)


SHAPERS = (soft_clip, hard_clip, diode, fuzz, fold)


@lru_cache(maxsize=1)
def compensation_luts():
    """[5, 256] input_rms/output_rms per (type, drive) — host-precomputed
    with the reference's 5-partial probe signal (distortion.rs:84-121).
    Runs eagerly even when first touched inside a jit trace."""
    import jax
    with jax.ensure_compile_time_eval():
        return _build_luts()


def _build_luts():
    partials = [(1.0, 0.60), (2.7, 0.25), (5.3, 0.10), (9.1, 0.03), (14.6, 0.02)]
    peak = sum(a for _, a in partials)
    n = 256
    t = 2.0 * math.pi * (np.arange(n) + 0.5) / n
    sig = sum(a * np.sin(f * t) for f, a in partials) / peak
    sig = jnp.asarray(sig, jnp.float32)
    in_rms = float(jnp.sqrt(jnp.mean(sig**2)))
    drives = np.arange(_LUT_SIZE) / (_LUT_SIZE - 1) * MAX_DRIVE
    luts = np.ones((len(SHAPERS), _LUT_SIZE), np.float32)
    for s, shaper in enumerate(SHAPERS):
        for i, d in enumerate(drives):
            out = shaper(sig, jnp.float32(d))
            orms = float(jnp.sqrt(jnp.mean(out**2)))
            luts[s, i] = in_rms / orms if orms > 1e-10 else 1.0
    return luts  # NumPy: safe to cache across jit traces


class DistortionEffect(Effect):
    PARAMS = (DIST_TYPE, DRIVE, MIX)
    WEIGHT = 1

    def __init__(self, distortion_type: str = "Diode", drive: float = 0.0,
                 mix: float = 1.0, name=None):
        super().__init__(name)
        self.distortion_type = distortion_type
        self.drive = float(drive)
        self.mix = float(mix)

    def param_initials(self):
        return {
            DIST_TYPE.id: DIST_TYPE.index_of(self.distortion_type),
            DRIVE.id: self.drive,
            MIX.id: self.mix,
        }

    def process(self, state, x, params, ctx: BuildCtx):
        t = params[DIST_TYPE.id][0].astype(jnp.int32)
        drive = params[DRIVE.id]  # [n]
        mix = params[MIX.id]  # [n]

        luts = jnp.asarray(compensation_luts())
        pos = jnp.clip(drive / MAX_DRIVE, 0.0, 1.0) * (_LUT_SIZE - 1)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, _LUT_SIZE - 1)
        frac = pos - lo
        lut = luts[t]
        comp = lut[lo] + (lut[hi] - lut[lo]) * frac

        shaped = jnp.stack([f(x, drive[None, :]) for f in SHAPERS])
        wet = shaped[t] * comp[None, :]
        y = (1.0 - mix[None, :]) * x + mix[None, :] * wet
        return state, y
