"""Silent placeholder source (reference: src/source/empty.rs, weight 0) and
null generator (reference: src/generator/empty.rs)."""

from __future__ import annotations

import jax.numpy as jnp

from ..graph.nodes import BuildCtx, Source
from ..generators.base import Generator


class EmptySource(Source):
    WEIGHT = 0

    def duration_frames(self, ctx: BuildCtx):
        return 0

    def process(self, state, x, params, ctx: BuildCtx):
        return state, jnp.zeros((ctx.channels, ctx.block_frames), jnp.float32)


class EmptyGenerator(Generator):
    WEIGHT = 0

    def lower_block_inputs(self, block_start, block_len):
        return None

    def duration_frames(self, ctx: BuildCtx):
        return 0

    def process(self, state, x, params, ctx: BuildCtx):
        return state, jnp.zeros((ctx.channels, ctx.block_frames), jnp.float32)
