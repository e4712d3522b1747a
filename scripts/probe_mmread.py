"""Ground-truth microbench of one-hot read formulations at the FileSource
shape: 131072 positions read from a ~12k-frame mono buffer (R-1 = 94 rows),
at batch 1 and batch 256 (16 src x 16 lanes).  Run ALONE."""
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
R = 95          # packed rows (12000-frame buffer)
N_POS = 131072
CHUNK = 2048
NC = N_POS // CHUNK

rng = np.random.default_rng(0)


def mk(batch):
    flat = jnp.asarray(rng.normal(size=(batch, R, 128)).astype(np.float32))
    kil = jnp.asarray(
        rng.integers(0, 128 * (R - 1) - 1, size=(batch, NC, CHUNK)).astype(np.int32))
    return flat, kil


def run(tag, fn, batch, reps=5):
    flat, kil = mk(batch)
    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    out = jfn(flat, kil)
    jax.block_until_ready(out)
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jfn(flat, kil)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1000.0
    print(json.dumps({f"{tag}_b{batch}_ms": round(ms, 2),
                      f"{tag}_b{batch}_comp_s": round(comp, 1)}), flush=True)


rows = jnp.arange(R - 1, dtype=jnp.int32)


def v_old(flat, kil):
    # two f32 matmuls at HIGHEST (round-3 formulation)
    f2 = flat.reshape(flat.shape[0], R, 128)

    def one(fl, kk):
        def body(k):
            hi = k >> 7
            oh = (hi[:, None] == rows).astype(jnp.float32)
            w0 = jnp.matmul(oh, fl[:-1].reshape(R - 1, 128), precision=HI)
            w1 = jnp.matmul(oh, fl[1:].reshape(R - 1, 128), precision=HI)
            return w0.sum(-1) + w1.sum(-1)  # reduce: keep data dependence
        return jax.lax.map(body, kk)
    return jax.vmap(one)(f2, kil)


def v_bf16x3(flat, kil):
    # bf16x3 pair-packed single matmul (current round-4 formulation)
    hi = flat.astype(jnp.bfloat16)
    r1 = flat - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    f3 = jnp.stack([hi, mid, lo], -1)  # [B, R, 128, 3]
    pairs = jnp.concatenate([f3[:, :-1], f3[:, 1:]], axis=2)  # [B, R-1, 256, 3]
    pairs = pairs.reshape(flat.shape[0], R - 1, 768)

    def one(fl, kk):
        def body(k):
            hi = k >> 7
            oh = (hi[:, None] == rows).astype(jnp.bfloat16)
            w = jnp.matmul(oh, fl, preferred_element_type=jnp.float32)
            return w.reshape(CHUNK, 256, 3).sum(-1).sum(-1)
        return jax.lax.map(body, kk)
    return jax.vmap(one)(pairs, kil)


def v_f32pair(flat, kil):
    # f32 HIGHEST single pair-packed matmul (N=256)
    pairs = jnp.concatenate([flat[:, :-1], flat[:, 1:]], axis=2)  # [B, R-1, 256]

    def one(fl, kk):
        def body(k):
            hi = k >> 7
            oh = (hi[:, None] == rows).astype(jnp.float32)
            w = jnp.matmul(oh, fl, precision=HI)
            return w.sum(-1)
        return jax.lax.map(body, kk)
    return jax.vmap(one)(pairs, kil)


def v_f32default(flat, kil):
    # f32 DEFAULT precision (inexact data; rate reference)
    pairs = jnp.concatenate([flat[:, :-1], flat[:, 1:]], axis=2)

    def one(fl, kk):
        def body(k):
            hi = k >> 7
            oh = (hi[:, None] == rows).astype(jnp.float32)
            w = jnp.matmul(oh, fl)
            return w.sum(-1)
        return jax.lax.map(body, kk)
    return jax.vmap(one)(pairs, kil)


def v_bf16raw(flat, kil):
    # single bf16 matmul, bf16 data (inexact; pure MXU rate reference)
    pairs = jnp.concatenate([flat[:, :-1], flat[:, 1:]], axis=2).astype(jnp.bfloat16)

    def one(fl, kk):
        def body(k):
            hi = k >> 7
            oh = (hi[:, None] == rows).astype(jnp.bfloat16)
            w = jnp.matmul(oh, fl, preferred_element_type=jnp.float32)
            return w.sum(-1)
        return jax.lax.map(body, kk)
    return jax.vmap(one)(pairs, kil)


def v_gather(flat, kil):
    # plain 2-tap gather reference
    def one(fl, kk):
        f = fl.reshape(-1)

        def body(k):
            return jnp.take(f, k, axis=0) + jnp.take(f, k + 1, axis=0)
        return jax.lax.map(body, kk)
    return jax.vmap(one)(flat, kil)


def v_bf16x2(flat, kil):
    # bf16x2 pair-packed (N=512, ~-100 dB accuracy)
    hi = flat.astype(jnp.bfloat16)
    mid = (flat - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    f2 = jnp.stack([hi, mid], -1)
    pairs = jnp.concatenate([f2[:, :-1], f2[:, 1:]], axis=2)
    pairs = pairs.reshape(flat.shape[0], R - 1, 512)

    def one(fl, kk):
        def body(k):
            hi = k >> 7
            oh = (hi[:, None] == rows).astype(jnp.bfloat16)
            w = jnp.matmul(oh, fl, preferred_element_type=jnp.float32)
            return w.reshape(CHUNK, 256, 2).sum(-1).sum(-1)
        return jax.lax.map(body, kk)
    return jax.vmap(one)(pairs, kil)


for batch in (1, 256):
    for tag, fn in (("old2xHI", v_old), ("bf16x3pair", v_bf16x3),
                    ("f32HIpair", v_f32pair), ("f32DEFpair", v_f32default),
                    ("bf16raw", v_bf16raw), ("bf16x2pair", v_bf16x2),
                    ("gather", v_gather)):
        try:
            run(tag, fn, batch)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({f"{tag}_b{batch}_error": repr(e)[:160]}),
                  flush=True)
