"""Post-campaign headline scaling: x1 step, scan8 x1, scan8 x16 on the
16-src mixer graph (bench config 3).  Also warms the persistent compile
cache for the driver's end-of-round bench run."""
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

np.asarray(jax.jit(lambda: jnp.zeros(2))())  # force real mode

import bench
from phonic_tpu.parallel.mesh import BatchedRenderProgram


def emit(**kw):
    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                      for k, v in kw.items()}), flush=True)


def measure_step(reps=5):
    prog = bench.config_mixer_graph()
    state = prog.init_state()
    inputs = prog.packed_block_inputs(0)
    t0 = time.perf_counter()
    state, audio = prog.step_packed(state, inputs)
    jax.block_until_ready(audio)
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        state, audio = prog.step_packed(state, inputs)
    jax.block_until_ready(audio)
    ms = (time.perf_counter() - t0) / reps * 1e3
    emit(shape="x1_step", ms_per_block=ms, compile_s=c,
         x_rt=prog.ctx.block_frames / prog.ctx.sample_rate / (ms / 1e3))


def measure_scan(lanes, scan_blocks, reps=3):
    prog = bench.config_mixer_graph()
    b = BatchedRenderProgram(prog, lanes=lanes)
    states = b.init_states()
    stacked = b.stacked_inputs(scan_blocks)
    t0 = time.perf_counter()
    states, audio = b.scan_step(states, stacked)
    jax.block_until_ready(audio)
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        states, audio = b.scan_step(states, stacked)
    jax.block_until_ready(audio)
    dt = (time.perf_counter() - t0) / reps
    xrt = (lanes * scan_blocks * prog.ctx.block_frames
           / prog.ctx.sample_rate / dt)
    emit(shape=f"scan{scan_blocks}_x{lanes}", s_per_dispatch=dt,
         compile_s=c, x_rt=xrt)


if __name__ == "__main__":
    measure_step()
    measure_scan(1, 8)
    measure_scan(16, 8)
