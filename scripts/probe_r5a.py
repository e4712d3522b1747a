"""Round-5 status probe: measure every bench config single-lane on the TPU
after the Pallas ramp-read landed (time-bounded loops per ADVICE r4)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

np.asarray(jax.jit(lambda: jnp.zeros(2))())  # force real mode (CLAUDE.md)

import bench


def measure(name, min_iters=5, min_secs=1.0):
    prog = bench.CONFIGS[name]()
    t0 = time.perf_counter()
    if hasattr(prog, "render_block"):
        rt = bench.bench_program(prog)
        print(json.dumps({name + "_x_rt": round(rt, 1),
                          name + "_compile_s": round(
                              time.perf_counter() - t0, 1)}), flush=True)
        return
    state = prog.init_state()
    inputs = prog.packed_block_inputs(0)
    state, audio = prog.step_packed(state, inputs)
    jax.block_until_ready(audio)
    compile_s = time.perf_counter() - t0
    iters = 0
    t0 = time.perf_counter()
    while True:
        state, audio = prog.step_packed(state, inputs)
        iters += 1
        if iters >= min_iters and time.perf_counter() - t0 > min_secs:
            break
    jax.block_until_ready(audio)
    ms = (time.perf_counter() - t0) / iters * 1000.0
    xrt = prog.ctx.block_frames / prog.ctx.sample_rate / (ms / 1000.0)
    print(json.dumps({name + "_ms": round(ms, 1),
                      name + "_x_rt": round(xrt, 1),
                      name + "_compile_s": round(compile_s, 1)}), flush=True)


for nm in sys.argv[1:] or list(bench.CONFIGS):
    try:
        measure(nm)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({nm + "_error": repr(e)[:300]}), flush=True)
