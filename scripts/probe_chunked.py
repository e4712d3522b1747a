"""Chunked two-level scan vs associative scan, standalone 5-band cascade
([2, 131072], the eq5 shape) at x1/x16 lanes, then the full 16-src headline
graph x1/x16."""
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

from phonic_tpu.ops import filters
from phonic_tpu.ops import scan as S

T = 131072


def cascade(x, mode):
    # 5 cascaded bell biquads, like eq5 (per-sample constant coef arrays)
    y = x
    sts = []
    for i in range(5):
        coefs = filters.biquad_coefficients(
            filters.BELL, 48000, 1000.0 * (i + 1), 1.0, 3.0)
        st = filters.tpt_state_init(x.shape[:-1])
        if mode == "assoc":
            # bypass the chunked route by calling the associative internals
            xs = x.astype(jnp.float32)
            a1, a2, a3, m0, m1, m2 = [jnp.asarray(c) for c in coefs]
            s0_1 = st.ic1
            s0_2 = st.ic2
            arrs = jnp.broadcast_arrays(
                2.0 * a1 - 1.0, -2.0 * a2 + jnp.zeros_like(y),
                2.0 * a2 + jnp.zeros_like(y), 1.0 - 2.0 * a3,
                2.0 * a2 * y, 2.0 * a3 * y)
            first1 = arrs[4][..., 0] + arrs[0][..., 0] * s0_1 + arrs[1][..., 0] * s0_2
            first2 = arrs[5][..., 0] + arrs[2][..., 0] * s0_1 + arrs[3][..., 0] * s0_2
            b1 = jnp.concatenate([first1[..., None], arrs[4][..., 1:]], axis=-1)
            b2 = jnp.concatenate([first2[..., None], arrs[5][..., 1:]], axis=-1)

            def combine(lhs, rhs):
                l11, l12, l21, l22, lb1, lb2 = lhs
                r11, r12, r21, r22, rb1, rb2 = rhs
                return (r11 * l11 + r12 * l21, r11 * l12 + r12 * l22,
                        r21 * l11 + r22 * l21, r21 * l12 + r22 * l22,
                        r11 * lb1 + r12 * lb2 + rb1, r21 * lb1 + r22 * lb2 + rb2)

            out = jax.lax.associative_scan(
                combine, (arrs[0], arrs[1], arrs[2], arrs[3], b1, b2), axis=-1)
            s1, s2 = out[4], out[5]
            v1 = 0.5 * (s1 + jnp.concatenate([s0_1[..., None] * jnp.ones_like(s1[..., :1]), s1[..., :-1]], -1))
            v2 = 0.5 * (s2 + jnp.concatenate([s0_2[..., None] * jnp.ones_like(s2[..., :1]), s2[..., :-1]], -1))
            y = coefs.m0 * y + coefs.m1 * v1 + coefs.m2 * v2
        else:
            _, y = filters.tpt_process(st, y, coefs)
    return y


def timeit(tag, fn, *args):
    t0 = time.perf_counter()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1000.0
    print(json.dumps({f"{tag}_ms": round(ms, 2),
                      f"{tag}_compile_s": round(compile_s, 1)}), flush=True)
    return out


x1 = jnp.asarray(np.random.default_rng(0).normal(size=(2, T)).astype(np.float32))
x16 = jnp.asarray(np.random.default_rng(0).normal(size=(16, 2, T)).astype(np.float32))

y_new = timeit("casc_new_x1", lambda v: cascade(v, "new"), x1)
y_old = timeit("casc_assoc_x1", lambda v: cascade(v, "assoc"), x1)
print(json.dumps({"casc_maxdiff": float(jnp.max(jnp.abs(y_new - y_old)))}),
      flush=True)
timeit("casc_new_x16", lambda v: cascade(v, "new"), x16)
timeit("casc_assoc_x16", lambda v: cascade(v, "assoc"), x16)

# full headline graph
from phonic_tpu.parallel.mesh import BatchedRenderProgram
import bench

prog = bench.config_mixer_graph()
state = prog.init_state()
inputs = prog.packed_block_inputs(0)
t0 = time.perf_counter()
state2, audio = prog.step_packed(state, inputs)
jax.block_until_ready(audio)
print(json.dumps({"hl_x1_compile_s": round(time.perf_counter() - t0, 1)}),
      flush=True)
reps = 5
t0 = time.perf_counter()
for _ in range(reps):
    state2, audio = prog.step_packed(state, inputs)
jax.block_until_ready(audio)
ms = (time.perf_counter() - t0) / reps * 1000.0
print(json.dumps({"hl_x1_ms": round(ms, 1),
                  "hl_x1_xrt": round(131072 / 48000 / (ms / 1000.0), 1)}),
      flush=True)

b = BatchedRenderProgram(prog, lanes=16)
states = b.init_states()
binputs = b.block_inputs(0)
t0 = time.perf_counter()
states2, audio = b.step(states, binputs)
jax.block_until_ready(audio)
print(json.dumps({"hl_x16_compile_s": round(time.perf_counter() - t0, 1)}),
      flush=True)
t0 = time.perf_counter()
for _ in range(reps):
    states2, audio = b.step(states, binputs)
jax.block_until_ready(audio)
ms = (time.perf_counter() - t0) / reps * 1000.0
print(json.dumps({"hl_x16_ms": round(ms, 1),
                  "hl_x16_xrt_agg": round(16 * 131072 / 48000 / (ms / 1000.0), 1)}),
      flush=True)
