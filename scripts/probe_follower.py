"""Validate + time ops/follower.py on the TPU: pallas vs XLA, vmap case."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from phonic_tpu.ops import follower as fo

N = 131072
np.asarray(jax.jit(lambda: jnp.zeros(2))())  # force real mode


def timeit(fn, *args, reps=5):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps * 1000.0


rng = np.random.default_rng(0)
in_db = jnp.asarray(rng.uniform(-80, 0, N).astype(np.float32))
aa = jnp.full((N,), 0.05, jnp.float32)
ra = jnp.full((N,), 0.001, jnp.float32)
thr = jnp.full((N,), -40.0, jnp.float32)
rdb = jnp.full((N,), -60.0, jnp.float32)
hs = jnp.full((N,), 4410.0, jnp.float32)

# --- follower ---------------------------------------------------------------
f_pal = jax.jit(lambda x, a, r: fo.asym_follower(x, a, r, jnp.float32(-120.0)))
f_xla = jax.jit(lambda x, a, r: fo._follower_xla(x, a, r, jnp.float32(-120.0)))

e1, env1 = f_pal(in_db, aa, ra)
e2, env2 = f_xla(in_db, aa, ra)
err = float(jnp.max(jnp.abs(env1 - env2)))
print(json.dumps({"follower_err": err,
                  "follower_end_err": float(abs(e1 - e2))}), flush=True)
print(json.dumps({"follower_pallas_ms": round(timeit(f_pal, in_db, aa, ra), 2),
                  "follower_xla_ms": round(timeit(f_xla, in_db, aa, ra), 2)}),
      flush=True)

# --- gate -------------------------------------------------------------------
g_pal = jax.jit(lambda x, a, r, t, g, h: fo.gate_machine(
    x, a, r, t, g, h, jnp.float32(-120.0), jnp.float32(0.0),
    jnp.float32(-60.0)))
g_xla = jax.jit(lambda x, a, r, t, g, h: fo._gate_xla(
    x, t, g, a, r, h, jnp.float32(-120.0), jnp.float32(0.0),
    jnp.float32(-60.0)))
# NOTE: _gate_xla signature is (in, aa, ra, thr, rng, hs, ...) -- check order
st1, gains1 = g_pal(in_db, aa, ra, thr, rdb, hs)
st2, gains2 = fo._gate_xla(in_db, aa, ra, thr, rdb, hs,
                           jnp.float32(-120.0), jnp.float32(0.0),
                           jnp.float32(-60.0))
gerr = float(jnp.max(jnp.abs(gains1 - gains2)))
sterr = float(max(abs(st1[0] - st2[0]), abs(st1[1] - st2[1]),
                  abs(st1[2] - st2[2])))
print(json.dumps({"gate_err": gerr, "gate_state_err": sterr}), flush=True)
print(json.dumps({"gate_pallas_ms": round(
    timeit(g_pal, in_db, aa, ra, thr, rdb, hs), 2)}), flush=True)

# --- vmap (batched effect stage) --------------------------------------------
try:
    B = 4
    xb = jnp.stack([in_db] * B) + jnp.arange(B, dtype=jnp.float32)[:, None]
    vm = jax.jit(jax.vmap(lambda x: fo.asym_follower(
        x, aa, ra, jnp.float32(-120.0))))
    eb, envb = vm(xb)
    ref = jnp.stack([f_xla(xb[i], aa, ra)[1] for i in range(B)])
    verr = float(jnp.max(jnp.abs(envb - ref)))
    print(json.dumps({"vmap_err": verr,
                      "vmap_b4_ms": round(timeit(vm, xb), 2)}), flush=True)
except Exception as e:  # noqa: BLE001
    print(json.dumps({"vmap_error": repr(e)[:300]}), flush=True)
