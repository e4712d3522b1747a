"""Headline 16-src graph after the round-4 gather purge: single lane,
vmapped lanes, scan-over-blocks."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/phonic_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

np.asarray(jax.jit(lambda: jnp.zeros(2))())

import bench
from phonic_tpu.parallel.mesh import BatchedRenderProgram


def emit(**kw):
    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                      for k, v in kw.items()}), flush=True)


def run_x1():
    prog = bench.CONFIGS["mixer_graph_16src"]()
    state = prog.init_state()
    inputs = prog.packed_block_inputs(0)
    t0 = time.perf_counter()
    state, audio = prog.step_packed(state, inputs)
    jax.block_until_ready(audio)
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        state, audio = prog.step_packed(state, inputs)
    jax.block_until_ready(audio)
    ms = (time.perf_counter() - t0) / reps * 1000
    emit(x1_ms=ms, x1_xrt=prog.ctx.block_frames / prog.ctx.sample_rate * 1000 / ms,
         x1_compile_s=comp)
    return prog


def run_lanes(lanes):
    prog = bench.CONFIGS["mixer_graph_16src"]()
    b = BatchedRenderProgram(prog, lanes=lanes)
    states = b.init_states()
    inputs = b.block_inputs(0)
    t0 = time.perf_counter()
    states, audio = b.step(states, inputs)
    jax.block_until_ready(audio)
    comp = time.perf_counter() - t0
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        states, audio = b.step(states, inputs)
    jax.block_until_ready(audio)
    ms = (time.perf_counter() - t0) / reps * 1000
    xrt = lanes * prog.ctx.block_frames / prog.ctx.sample_rate * 1000 / ms
    emit(**{f"x{lanes}_ms": ms, f"x{lanes}_xrt_aggregate": xrt,
            f"x{lanes}_compile_s": comp})


def run_scan(lanes, blocks):
    prog = bench.CONFIGS["mixer_graph_16src"]()
    b = BatchedRenderProgram(prog, lanes=lanes)
    states = b.init_states()
    stacked = b.stacked_inputs(blocks)
    t0 = time.perf_counter()
    states, audio = b.scan_step(states, stacked)
    jax.block_until_ready(audio)
    comp = time.perf_counter() - t0
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        states, audio = b.scan_step(states, stacked)
    jax.block_until_ready(audio)
    ms = (time.perf_counter() - t0) / reps * 1000
    xrt = lanes * blocks * prog.ctx.block_frames / prog.ctx.sample_rate * 1000 / ms
    emit(**{f"scan{blocks}_x{lanes}_ms": ms,
            f"scan{blocks}_x{lanes}_xrt_aggregate": xrt,
            f"scan{blocks}_x{lanes}_compile_s": comp})


for step in sys.argv[1:] or ["x1", "x16", "scan8x16"]:
    try:
        if step == "x1":
            run_x1()
        elif step.startswith("scan"):
            b, l = step[4:].split("x")
            run_scan(int(l), int(b))
        else:
            run_lanes(int(step[1:]))
    except Exception as e:  # noqa: BLE001
        emit(**{step + "_error": repr(e)[:300]})
