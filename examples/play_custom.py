"""Custom user Effect + SynthDef — the analog of reference
examples/play-custom.rs (custom Effect and SynthSourceGenerator impls)."""

import sys, os
sys.path.insert(0, os.path.dirname(__file__))
from common import make_parser, make_player

import jax.numpy as jnp

from phonic_tpu.graph.nodes import BuildCtx, Effect
from phonic_tpu.params import FloatParameter
from phonic_tpu.sources.synth import SynthDef, SynthPlaybackOptions
from phonic_tpu.ops import osc

DEPTH = FloatParameter("trem", "Tremolo Depth", 0.0, 1.0, 0.5)


class TremoloEffect(Effect):
    """A minimal custom effect: LFO amplitude modulation."""

    PARAMS = (DEPTH,)

    def __init__(self, rate_hz=5.0, name=None):
        super().__init__(name)
        self.rate_hz = rate_hz

    def init_state(self, ctx: BuildCtx):
        return {"phase": jnp.float32(0.0)}

    def process(self, state, x, params, ctx: BuildCtx):
        ph, end = osc.phase_accumulate(
            state["phase"], jnp.full((ctx.block_frames,), self.rate_hz),
            ctx.sample_rate)
        mod = 1.0 - params[DEPTH.id] * (0.5 + 0.5 * osc.sine(ph))
        return {"phase": end}, x * mod[None, :]


def chiptune() -> SynthDef:
    """A custom square-wave SynthDef."""

    def init(ctx):
        return {"phase": jnp.float32(0.0)}

    def render(state, sctx):
        ph, end = osc.phase_accumulate(state["phase"], sctx.freq, sctx.sample_rate)
        return {"phase": end}, osc.square(ph, sctx.freq, sctx.sample_rate) * 0.3 * sctx.gate

    return SynthDef(init=init, render=render)


def main():
    args = make_parser("custom effect + synth").parse_args()
    player = make_player(args)
    player.play_synth(chiptune(), SynthPlaybackOptions(
        frequency=330.0, duration=2 * args.sample_rate))
    fx = player.add_effect(TremoloEffect(rate_hz=6.0))
    fx.set_parameter("trem", 0.8, at=args.sample_rate)
    player.run()
    print(f"rendered {player.position} frames")
    player.close()


if __name__ == "__main__":
    main()
