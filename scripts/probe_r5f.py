"""Round-5f: device exactness of Precision.HIGH one-hot selects, then
re-measure mastering/mixer idle."""
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

np.asarray(jax.jit(lambda: jnp.zeros(2))())
print("real mode", flush=True)

from phonic_tpu.ops import chrono as ch


def check_high_exact():
    """read_frac_win at HIGH must match a plain gather bit-for-bit."""
    rng = np.random.default_rng(11)
    W, b = 48128, 1024
    win = rng.standard_normal((2, W)).astype(np.float32)
    offs = rng.uniform(b + 1, W - 2, size=(b,)).astype(np.float32)
    dev = np.asarray(jax.jit(ch.read_frac_win)(jnp.asarray(win),
                                               jnp.asarray(offs)))
    # NumPy oracle (same float32 steps)
    oi = np.floor(offs)
    of = (offs - oi).astype(np.float32)
    is_int = of == 0
    j = np.arange(b)
    rel = (W + j - oi.astype(np.int32) - np.where(is_int, 0, 1)).astype(int)
    frac = np.where(is_int, of, np.float32(1.0) - of)
    v1 = win[:, rel]
    v2 = win[:, rel + 1]
    ref = v1 + (v2 - v1) * frac
    print(json.dumps({"high_exact_max_diff": float(np.max(np.abs(dev - ref))),
                      "ref_max": float(np.max(np.abs(ref)))}), flush=True)


def measure(name):
    import bench
    prog = bench.CONFIGS[name]()
    state = prog.init_state()
    inputs = prog.packed_block_inputs(0)
    t0 = time.perf_counter()
    state, audio = prog.step_packed(state, inputs)
    jax.block_until_ready(audio)
    cs = time.perf_counter() - t0
    iters = 0
    t0 = time.perf_counter()
    while True:
        state, audio = prog.step_packed(state, inputs)
        iters += 1
        if iters >= 5 and time.perf_counter() - t0 > 1.0:
            break
    jax.block_until_ready(audio)
    ms = (time.perf_counter() - t0) / iters * 1000.0
    xrt = prog.ctx.block_frames / prog.ctx.sample_rate / (ms / 1000.0)
    print(json.dumps({name + "_ms": round(ms, 1), name + "_x_rt": round(xrt, 1),
                      name + "_compile_s": round(cs, 1)}), flush=True)


for arg in sys.argv[1:] or ["exact", "mastering_chain", "mixer_graph_16src"]:
    try:
        if arg == "exact":
            check_high_exact()
        else:
            measure(arg)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({arg + "_error": repr(e)[:300]}), flush=True)
