"""Measure the granular_1k and mastering bench configs on the TPU after the
round-4 rewrites (mm grain reads, pallas dynamics kernels)."""
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


def measure(name, reps=3):
    prog = bench.CONFIGS[name]()
    state = prog.init_state()
    inputs = prog.packed_block_inputs(0)
    t0 = time.perf_counter()
    state, audio = prog.step_packed(state, inputs)
    jax.block_until_ready(audio)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        state, audio = prog.step_packed(state, inputs)
    jax.block_until_ready(audio)
    ms = (time.perf_counter() - t0) / reps * 1000.0
    xrt = prog.ctx.block_frames / prog.ctx.sample_rate / (ms / 1000.0)
    print(json.dumps({name + "_ms": round(ms, 1),
                      name + "_x_rt": round(xrt, 1),
                      name + "_compile_s": round(compile_s, 1)}), flush=True)


for nm in sys.argv[1:] or ["granular_1k", "mastering_chain"]:
    try:
        measure(nm)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({nm + "_error": repr(e)[:300]}), flush=True)
