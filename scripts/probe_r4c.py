"""Round-4 probe set: follower-scan variants, gather vs vector rates at
granular shapes, pallas sequential prototype, new reverb cost.

Run strictly alone (no concurrent pytest): python scripts/probe_r4c.py
Prints one JSON line per probe, incrementally.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

N = 131072
OUT = {}


def emit(k, v):
    OUT[k] = round(float(v), 3)
    print(json.dumps({k: OUT[k]}), flush=True)


def force_real():
    np.asarray(jax.jit(lambda: jnp.zeros(2))())


def timeit(fn, *args, reps=3, warm=1):
    for _ in range(warm):
        r = fn(*args)
        jax.block_until_ready(r)
    # force a data read so the speculator can't fake it (already forced
    # globally, but belt+braces: fetch one leaf)
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps * 1000.0


# ---------------------------------------------------------------------------
force_real()
print(json.dumps({"backend": jax.default_backend()}), flush=True)

# --- 0. true elementwise throughput vs size (find the dispatch floor) ------
@jax.jit
def ew_chain(x):
    for _ in range(10):
        x = x * 1.000001 + 0.3
        x = jnp.abs(x) - 0.1
    return x

for sz_m in (8, 67, 268):
    x = jnp.zeros((sz_m * 1024 * 1024 // 4,), jnp.float32)
    emit(f"ew20_{sz_m}MB_ms", timeit(ew_chain, x))

# --- 1. follower scan variants (compressor-shaped, n=131072) ---------------
def mk_scan3(unroll):
    @jax.jit
    def f(env0, in_db, aa, ra):
        def step(env, xs):
            in_db, aa, ra = xs
            a = jnp.where(in_db > env, aa, ra)
            env = env + a * (in_db - env)
            return env, env
        xs = tuple(jnp.broadcast_to(v, (N,)).astype(jnp.float32)
                   for v in (in_db, aa, ra))
        return jax.lax.scan(step, env0, xs, unroll=unroll)
    return f

def mk_scan_stacked(unroll):
    @jax.jit
    def f(env0, xs):  # xs [N, 3]
        def step(env, row):
            in_db, aa, ra = row[0], row[1], row[2]
            a = jnp.where(in_db > env, aa, ra)
            env = env + a * (in_db - env)
            return env, env
        return jax.lax.scan(step, env0, xs, unroll=unroll)
    return f

def mk_scan_scalar(unroll):
    @jax.jit
    def f(env0, in_db, aa, ra):
        def step(env, in_db):
            a = jnp.where(in_db > env, aa, ra)
            env = env + a * (in_db - env)
            return env, env
        return jax.lax.scan(step, env0, in_db, unroll=unroll)
    return f

rng = np.random.default_rng(0)
in_db = jnp.asarray(rng.uniform(-80, 0, N).astype(np.float32))
xs3 = jnp.stack([in_db, jnp.full((N,), 0.05, jnp.float32),
                 jnp.full((N,), 0.001, jnp.float32)], axis=1)
env0 = jnp.float32(-120.0)
aa = jnp.float32(0.05)
ra = jnp.float32(0.001)

emit("scan3_u64_ms", timeit(mk_scan3(64), env0, in_db, aa, ra))
emit("scan3_u256_ms", timeit(mk_scan3(256), env0, in_db, aa, ra))
emit("scan_stacked_u64_ms", timeit(mk_scan_stacked(64), env0, xs3))
emit("scan_scalar_u64_ms", timeit(mk_scan_scalar(64), env0, in_db, aa, ra))
emit("scan_scalar_u256_ms", timeit(mk_scan_scalar(256), env0, in_db, aa, ra))

# --- 2. pallas sequential follower prototype --------------------------------
try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TC = 2048

    def seq_kernel(x_ref, aa_ref, ra_ref, out_ref, carry_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            carry_ref[0, 0] = jnp.float32(-120.0)

        def body(i, env):
            in_db = x_ref[0, i]
            a = jnp.where(in_db > env, aa_ref[0, i], ra_ref[0, i])
            env = env + a * (in_db - env)
            out_ref[0, i] = env
            return env

        env = jax.lax.fori_loop(0, TC, body, carry_ref[0, 0])
        carry_ref[0, 0] = env

    @jax.jit
    def pallas_seq(x, aa_arr, ra_arr):
        grid = N // TC
        spec = pl.BlockSpec((1, TC), lambda i: (0, i), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            seq_kernel,
            grid=(grid,),
            in_specs=[spec, spec, spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
            scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32)],
        )(x, aa_arr, ra_arr)

    x2 = in_db[None, :]
    aa_arr = jnp.full((1, N), 0.05, jnp.float32)
    ra_arr = jnp.full((1, N), 0.001, jnp.float32)
    t = timeit(pallas_seq, x2, aa_arr, ra_arr)
    # correctness vs scan
    ref = np.asarray(mk_scan_scalar(64)(env0, in_db, aa, ra)[1])
    got = np.asarray(pallas_seq(x2, aa_arr, ra_arr))[0]
    err = float(np.max(np.abs(ref - got)))
    emit("pallas_seq_ms", t)
    emit("pallas_seq_maxerr", err)
except Exception as e:  # noqa: BLE001
    print(json.dumps({"pallas_seq_error": repr(e)[:200]}), flush=True)

# --- 3. granular-shaped reads: [G=100, n] over 2048-chunks ------------------
G = 100
FRAMES = 96000
CH = 2048
buf = jnp.asarray(rng.uniform(-1, 1, FRAMES).astype(np.float32))
wtab = jnp.asarray(rng.uniform(0, 1, 8 * 2048).astype(np.float32))
pos0 = jnp.asarray(rng.uniform(0, 1, G).astype(np.float32))
inc = jnp.asarray(rng.uniform(-1, 1, G).astype(np.float32) / FRAMES)

def chunked(body):
    @jax.jit
    def f(buf, wtab, pos0, inc):
        def step(c, k):
            t0 = k * CH
            j = (t0 + jnp.arange(CH, dtype=jnp.int32)).astype(jnp.float32)
            pos = jnp.mod(pos0[:, None] + j[None, :] * inc[:, None], 1.0)
            return c, body(pos, buf, wtab)
        _, o = jax.lax.scan(step, 0.0, jnp.arange(N // CH, dtype=jnp.int32))
        return jnp.sum(o[-1])
    return f

def b_elementwise(pos, buf, wtab):
    x = pos
    for _ in range(12):
        x = x * 1.01 + 0.1
        x = jnp.abs(x) - 0.05
    return jnp.sum(x, axis=0)

def b_cr_gather(pos, buf, wtab):
    fidx = pos * (FRAMES - 1)
    i1 = jnp.minimum(fidx.astype(jnp.int32), FRAMES - 1)
    frac = fidx - i1
    i0 = jnp.where(i1 > 0, i1 - 1, FRAMES - 1)
    i2 = jnp.where(i1 < FRAMES - 1, i1 + 1, 0)
    i3 = jnp.where(i2 < FRAMES - 1, i2 + 1, 0)
    y0, y1, y2, y3 = buf[i0], buf[i1], buf[i2], buf[i3]
    a = -0.5 * y0 + 1.5 * y1 - 1.5 * y2 + 0.5 * y3
    b = y0 - 2.5 * y1 + 2.0 * y2 - 0.5 * y3
    c = -0.5 * y0 + 0.5 * y2
    return jnp.sum(((a * frac + b) * frac + c) * frac + y1, axis=0)

def b_win_gather(pos, buf, wtab):
    idx_f = jnp.clip(pos, 0.0, 1.0) * 2047
    idx = jnp.minimum(idx_f.astype(jnp.int32), 2046)
    frac = idx_f - idx
    lin = idx  # pretend mode 0
    a = wtab[lin]
    b = wtab[lin + 1]
    return jnp.sum(a * (1 - frac) + b * frac, axis=0)

def b_win_analytic(pos, buf, wtab):
    p = jnp.clip(pos, 0.0, 1.0)
    h = 0.5 * (1 - jnp.cos(2 * np.pi * p))
    bl = 0.42 - 0.5 * jnp.cos(2 * np.pi * p) + 0.08 * jnp.cos(4 * np.pi * p)
    tr = jnp.where(p < 0.5, 2 * p, 2 * (1 - p))
    ex = jnp.exp(-6.0 * jnp.abs(p - 0.5))
    w = 0.25
    tk = jnp.where(p < w, 0.5 * (1 - jnp.cos(np.pi * p / w)),
                   jnp.where(p > 1 - w, 0.5 * (1 - jnp.cos(np.pi * (1 - p) / w)), 1.0))
    out = h + bl + tr + ex + tk  # stand-in for select over modes
    return jnp.sum(out, axis=0)

for name, body in (("gr_elementwise12", b_elementwise),
                   ("gr_cr_gather", b_cr_gather),
                   ("gr_win_gather", b_win_gather),
                   ("gr_win_analytic", b_win_analytic)):
    try:
        emit(name + "_ms", timeit(chunked(body), buf, wtab, pos0, inc))
    except Exception as e:  # noqa: BLE001
        print(json.dumps({name + "_error": repr(e)[:200]}), flush=True)

# --- 4. new reverb cost ------------------------------------------------------
from phonic_tpu.effects.reverb import ReverbEffect
from phonic_tpu.graph.nodes import BuildCtx

ctx = BuildCtx(sample_rate=48000, channels=2, block_frames=N,
               max_events=0, scan_dtype=jnp.float32)
eff = ReverbEffect(room_size=0.6, wet=0.2)
st0 = eff.init_state(ctx)
params = {k: jnp.full((N,), v, jnp.float32)
          for k, v in eff.param_initials().items()}
x = jnp.asarray(rng.uniform(-0.5, 0.5, (2, N)).astype(np.float32))

@jax.jit
def run_reverb(st, x, params):
    return eff.process(st, x, params, ctx)

try:
    emit("reverb_new_ms", timeit(run_reverb, st0, x, params))
except Exception as e:  # noqa: BLE001
    print(json.dumps({"reverb_error": repr(e)[:300]}), flush=True)

print(json.dumps(OUT), flush=True)
