"""Third-stage read experiments (run ALONE):
A. batched one-hot matmul (per-lane rhs copies)  [256, 2048, 94]@[256,94,256]
B. shared-rhs (lane axis merged into M)          [16, 32768, 94]@[16,94,256]
C. B at DEFAULT precision (rate reference)
D. windowed K=34 batched (is the cost K-sensitive at all?)
E. K-on-sublane orientation (dot_general dim0 x dim0)
"""
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

HI = jax.lax.Precision.HIGHEST
R = 95
CHUNK = 2048
NC = 64
SRC = 16
LANES = 16
rng = np.random.default_rng(0)


def timeit(tag, fn, args, reps=5):
    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    out = jfn(*args)
    jax.block_until_ready(out)
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jfn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1000.0
    print(json.dumps({f"{tag}_ms": round(ms, 2),
                      f"{tag}_comp_s": round(comp, 1)}), flush=True)


rows = jnp.arange(R - 1, dtype=jnp.int32)
flat_src = jnp.asarray(rng.normal(size=(SRC, R - 1, 256)).astype(np.float32))
flat_all = jnp.asarray(np.broadcast_to(
    np.asarray(flat_src)[None], (LANES, SRC, R - 1, 256)).reshape(
        LANES * SRC, R - 1, 256).copy())
kil = jnp.asarray(rng.integers(
    0, 128 * (R - 1) - 1,
    size=(LANES, SRC, NC, CHUNK)).astype(np.int32))


def v_batched(flat, k):
    # [lanes*src] batch of separate matmuls (current engine shape)
    kk = k.reshape(LANES * SRC, NC, CHUNK)

    def one(fl, ks):
        def body(kc):
            oh = ((kc >> 7)[:, None] == rows).astype(jnp.float32)
            return jnp.matmul(oh, fl, precision=HI).sum(-1)
        return jax.lax.map(body, ks)
    return jax.vmap(one)(flat, kk)


def v_shared(flat, k, precision=HI):
    # rhs shared across lanes: lane axis folds into M
    kk = jnp.moveaxis(k, 0, 1).reshape(SRC, NC, LANES * CHUNK)

    def one(fl, ks):
        def body(kc):
            oh = ((kc >> 7)[:, None] == rows).astype(jnp.float32)
            return jnp.matmul(oh, fl, precision=precision).sum(-1)
        return jax.lax.map(body, ks)
    return jax.vmap(one)(flat, kk)


def v_shared_def(flat, k):
    return v_shared(flat, k, precision=jax.lax.Precision.DEFAULT)


W = 34
roww = jnp.arange(W, dtype=jnp.int32)


def v_windowed(flat, k):
    # per-chunk contiguous row window of W rows, small one-hot
    kk = k.reshape(LANES * SRC, NC, CHUNK)

    def one(fl, ks):
        def body(kc):
            base = jnp.min(kc) >> 7
            base = jnp.minimum(base, R - 1 - W)
            winf = jax.lax.dynamic_slice(fl, (base, jnp.zeros_like(base)),
                                         (W, 256))
            oh = (((kc >> 7) - base)[:, None] == roww).astype(jnp.float32)
            return jnp.matmul(oh, winf, precision=HI).sum(-1)
        return jax.lax.map(body, ks)
    return jax.vmap(one)(flat, kk)


def v_sublane(flat, k):
    # contraction dim on sublane for both operands: oh.T [K, C] x fl [K, N]
    kk = k.reshape(LANES * SRC, NC, CHUNK)
    dn = (((0,), (0,)), ((), ()))

    def one(fl, ks):
        def body(kc):
            oh_t = (rows[:, None] == (kc >> 7)[None, :]).astype(jnp.float32)
            out = jax.lax.dot_general(oh_t, fl, dn, precision=HI)  # [C, N]
            return out.sum(-1)
        return jax.lax.map(body, ks)
    return jax.vmap(one)(flat, kk)


timeit("A_batched", v_batched, (flat_all, kil))
timeit("B_sharedHI", v_shared, (flat_src, kil))
timeit("C_sharedDEF", v_shared_def, (flat_src, kil))
timeit("D_windowK34", v_windowed, (flat_all, kil))
timeit("E_sublaneK", v_sublane, (flat_all, kil))
