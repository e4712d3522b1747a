"""Clean serialized post-rewrite measurements (run ALONE — concurrent CPU
load corrupts relay timings): headline graph x1/x16/scan8, bare/eq
decomposition, granular_1k, mastering."""
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


def timeit_prog(tag, prog, lanes=1, reps=5):
    if lanes == 1:
        state = prog.init_state()
        inputs = prog.packed_block_inputs(0)
        step = prog.step_packed
    else:
        b = BatchedRenderProgram(prog, lanes=lanes)
        state = b.init_states()
        inputs = b.block_inputs(0)
        step = b.step
    t0 = time.perf_counter()
    s2, audio = step(state, inputs)
    jax.block_until_ready(audio)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        s2, audio = step(state, inputs)
    jax.block_until_ready(audio)
    ms = (time.perf_counter() - t0) / reps * 1000.0
    xrt = lanes * prog.ctx.block_frames / prog.ctx.sample_rate / (ms / 1000.0)
    print(json.dumps({f"{tag}_ms": round(ms, 1), f"{tag}_xrt": round(xrt, 1),
                      f"{tag}_compile_s": round(compile_s, 1)}), flush=True)


# 1. headline full graph
prog = bench.config_mixer_graph()
timeit_prog("hl_x1", prog)
timeit_prog("hl_x16", bench.config_mixer_graph(), lanes=16)

# 2. scan8 x16 (the deployment shape)
b = BatchedRenderProgram(bench.config_mixer_graph(), lanes=16)
states = b.init_states()
stacked = b.stacked_inputs(8)
t0 = time.perf_counter()
states2, audio = b.scan_step(states, stacked)
jax.block_until_ready(audio)
print(json.dumps({"scan8_x16_compile_s": round(time.perf_counter() - t0, 1)}),
      flush=True)
t0 = time.perf_counter()
for _ in range(3):
    states2, audio = b.scan_step(states, stacked)
jax.block_until_ready(audio)
ms = (time.perf_counter() - t0) / 3 * 1000.0
print(json.dumps({
    "scan8_x16_ms": round(ms, 1),
    "scan8_x16_xrt": round(16 * 8 * 131072 / 48000 / (ms / 1000.0), 1),
}), flush=True)

# 3. granular + mastering configs
timeit_prog("granular_1k", bench.config_granular_1k(), reps=3)
timeit_prog("mastering", bench.config_mastering(), reps=5)

# 4. decomposition at x16 (bare sources, +eq) to confirm lane-flatness
from probe_lanescale import build, measure  # noqa: E402

for tag, kw in (("bare", {}), ("eq", dict(with_eq=True))):
    for lanes in (1, 16):
        try:
            measure(tag, lanes, **kw)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({f"{tag}_x{lanes}_error": repr(e)[:200]}),
                  flush=True)
