"""Post-rewrite lane scaling: bare/eq/full 16-src graph at x1/x16 with the
chunked scans + bf16x3 single-pass mm read."""
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

from probe_lanescale import build, measure  # noqa: E402

for tag, kw in (("bare", {}),
                ("eq", dict(with_eq=True)),
                ("full", dict(with_eq=True, with_chorus=True,
                              with_reverb=True))):
    for lanes in (1, 16):
        try:
            measure(tag, lanes, **kw)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({f"{tag}_x{lanes}_error": repr(e)[:200]}),
                  flush=True)

# scan-over-blocks on the full graph: the headline deployment shape
from phonic_tpu.parallel.mesh import BatchedRenderProgram
import bench

prog = bench.config_mixer_graph()
b = BatchedRenderProgram(prog, lanes=16)
states = b.init_states()
stacked = b.stacked_inputs(8)
t0 = time.perf_counter()
states2, audio = b.scan_step(states, stacked)
jax.block_until_ready(audio)
print(json.dumps({"scan8_x16_compile_s": round(time.perf_counter() - t0, 1)}),
      flush=True)
reps = 3
t0 = time.perf_counter()
for _ in range(reps):
    states2, audio = b.scan_step(states, stacked)
jax.block_until_ready(audio)
ms = (time.perf_counter() - t0) / reps * 1000.0
print(json.dumps({
    "scan8_x16_ms": round(ms, 1),
    "scan8_x16_xrt_agg": round(16 * 8 * 131072 / 48000 / (ms / 1000.0), 1),
}), flush=True)
