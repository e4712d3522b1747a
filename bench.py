"""Benchmark: audio-seconds rendered per second per chip at 48 kHz stereo.

Runs the flagship mixer-graph config (16 endless file sources -> 4
sub-mixers with effects -> master bus) on the default JAX backend (the real
TPU under the driver) and prints ONE JSON line.

vs_baseline is the ratio against the BASELINE.json north star of 1000x
real time per chip (the reference publishes no numbers of its own; its
implicit target is 1x real time on a desktop CPU core).
"""

import json
import time

import numpy as np


def main():
    import jax

    from __graft_entry__ import _flagship_program

    # large blocks amortise the fixed per-step cost (the graph program is
    # op-count-bound, not FLOP-bound); 131072 frames = 2.73 s of audio/step
    block_frames = 131072
    prog = _flagship_program(block_frames=block_frames)
    sr = prog.ctx.sample_rate

    state = prog.init_state()
    inputs = prog.block_inputs(0)
    step = jax.jit(prog._step)

    # compile + warmup
    state, audio = step(state, inputs)
    jax.block_until_ready(audio)

    # steady-state timing: same inputs, state threads through
    n_iters = 50
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, audio = step(state, inputs)
    jax.block_until_ready(audio)
    dt = time.perf_counter() - t0

    audio_seconds = n_iters * block_frames / sr
    rt_factor = audio_seconds / dt
    print(
        json.dumps(
            {
                "metric": "audio_seconds_rendered_per_sec_per_chip",
                "value": round(rt_factor, 2),
                "unit": "x_realtime_48kHz_stereo_16src_mixergraph",
                "vs_baseline": round(rt_factor / 1000.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
