"""Example SynthDefs, mirroring the reference's demo instruments
(reference: examples/common/synths/{organ,sub3,dx7}.rs — behavioural
inspiration only; these are reimplemented on this engine's SynthDef
protocol with jnp/ops primitives)."""

from __future__ import annotations

import jax.numpy as jnp

from ..graph.nodes import BuildCtx
from ..ops import ahdsr as ahdsr_ops
from ..ops import filters
from ..ops import osc
from ..sources.synth import SynthContext, SynthDef


def _env(ctx: SynthContext, attack, hold, decay, sustain, release):
    """Shared AHDSR helper (the analog of utils/fundsp/ahdsr.rs): gate-driven
    envelope from the analytic AHDSR, release at the gate's falling edge."""
    p = ahdsr_ops.ahdsr_params(ctx.sample_rate, attack, hold, decay, sustain, release)
    return ahdsr_ops.ahdsr_values(p, 1.0, ctx.age, ctx.release_age)


def organ(drawbars=(1.0, 0.6, 0.4, 0.25, 0.15)) -> SynthDef:
    """Additive drawbar organ: stacked sine partials with a soft envelope."""

    def init(ctx: BuildCtx):
        return {"phase": jnp.zeros((len(drawbars),), jnp.float32)}

    def render(state, ctx: SynthContext):
        phases = []
        ends = []
        total = jnp.zeros((ctx.block_frames,), jnp.float32)
        for k, amp in enumerate(drawbars):
            ph, end = osc.phase_accumulate(state["phase"][k], ctx.freq * (k + 1),
                                           ctx.sample_rate)
            total = total + amp * osc.sine(ph)
            ends.append(end)
        env = _env(ctx, 0.005, 0.0, 0.0, 1.0, 0.08)
        y = total / sum(drawbars) * env
        return {"phase": jnp.stack(ends)}, y

    return SynthDef(init=init, render=render, channels=1)


def sub3(shape: float = 2.0, detune_cents: float = 7.0, cutoff: float = 2500.0,
         resonance: float = 0.4) -> SynthDef:
    """3-oscillator subtractive synth: detuned morphing oscillators into a
    resonant SVF lowpass with an AHDSR.

    Declares its core controls as user FourCC parameters (the analog of the
    reference sub3's shared parameters, examples/common/synths/sub3.rs:
    27-80): engine-smoothed, settable via handles, and modulation targets
    for SynthGenerator.with_modulation — modulation offsets arrive in
    ``ctx.mods`` and multiply the cutoff / add to shape."""

    from ..params import ExponentialScaling, FloatParameter

    P_SHAPE = FloatParameter("SHAP", "Osc Shape", 0.0, 3.0, shape,
                             smoothing=None)
    P_DETUNE = FloatParameter("DETN", "Detune", 0.0, 50.0, detune_cents,
                              unit="ct", smoothing=None)
    P_CUTOFF = FloatParameter("CUTF", "Cutoff", 20.0, 20000.0, cutoff,
                              unit="Hz", scaling=ExponentialScaling(2.5))
    P_RESO = FloatParameter("RESO", "Resonance", 0.0, 0.95, resonance)

    def init(ctx: BuildCtx):
        return {
            "phase": jnp.zeros((3,), jnp.float32),
            "svf": filters.tpt_state_init((1,)),
        }

    def render(state, ctx: SynthContext):
        shape_v = ctx.params.get("SHAP", jnp.float32(shape)) \
            + ctx.mods.get("SHAP", 0.0)
        det_c = ctx.params.get("DETN", jnp.float32(detune_cents))
        det = jnp.exp2(det_c / 1200.0)
        cut_p = ctx.params.get("CUTF", jnp.float32(cutoff)) \
            * (1.0 + ctx.mods.get("CUTF", 0.0))
        res = ctx.params.get("RESO", jnp.float32(resonance))
        freqs = [ctx.freq, ctx.freq * det, ctx.freq / det]
        mix = jnp.zeros((ctx.block_frames,), jnp.float32)
        ends = []
        for k, f in enumerate(freqs):
            ph, end = osc.phase_accumulate(state["phase"][k], f, ctx.sample_rate)
            mix = mix + osc.morph_osc(ph, shape_v, f, ctx.sample_rate)
            ends.append(end)
        mix = mix / 3.0
        env = _env(ctx, 0.01, 0.0, 0.3, 0.6, 0.15)
        # envelope also sweeps the filter cutoff
        cut = jnp.clip(cut_p * (0.2 + 0.8 * env), 20.0, ctx.sample_rate / 2.0)
        coefs = filters.svf_coefficients(filters.LOWPASS, ctx.sample_rate,
                                         cut, res)
        svf, filtered = filters.tpt_process(state["svf"], mix[None, :], coefs)
        return {"phase": jnp.stack(ends), "svf": svf}, filtered[0] * env

    return SynthDef(init=init, render=render, channels=1,
                    params=(P_SHAPE, P_DETUNE, P_CUTOFF, P_RESO))


def dx7(ratio: float = 2.0, index: float = 3.0) -> SynthDef:
    """Minimal 2-operator FM voice (DX7-flavoured): a modulator at
    ``ratio`` x the carrier frequency phase-modulates the carrier; the
    modulation index decays faster than the amplitude for the classic
    brightness-then-body attack."""

    def init(ctx: BuildCtx):
        return {"phase": jnp.zeros((2,), jnp.float32)}

    def render(state, ctx: SynthContext):
        mod_ph, mod_end = osc.phase_accumulate(state["phase"][0], ctx.freq * ratio,
                                               ctx.sample_rate)
        car_ph, car_end = osc.phase_accumulate(state["phase"][1], ctx.freq,
                                               ctx.sample_rate)
        amp_env = _env(ctx, 0.002, 0.0, 0.5, 0.4, 0.2)
        mod_env = _env(ctx, 0.001, 0.0, 0.15, 0.15, 0.1)
        modulator = jnp.sin(2.0 * jnp.pi * mod_ph) * index * mod_env * ctx.velocity
        carrier = jnp.sin(2.0 * jnp.pi * car_ph + modulator)
        return {"phase": jnp.stack([mod_end, car_end])}, carrier * amp_env

    return SynthDef(init=init, render=render, channels=1)
