"""Fourth-stage read experiments (run ALONE): overlap-packed rows.

Engine shape: 256 (16 lanes x 16 srcs) batch, mono buffers (N=128),
131072 positions in 2048-chunks via lax.map.

A. current hermite_read_mm (2 matmuls rows r/r+1 + 256-wide epilogue)
B. matmuls only (lower bound of A)
C. overlap-packed stride-124 rows: ONE matmul + 128-wide epilogue
D. overlap matmul only (lower bound of C)
E. C with chunk=8192
Prints max|A-C| as an exactness check.
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
F = 12000 + 977 * 8          # representative buffer frames
PAD = 4
R = -(-(PAD + F) // 128) + 1  # current packing rows
CHUNK = 2048
NC = 64
B = 256
rng = np.random.default_rng(0)

buf = rng.normal(size=(B, F)).astype(np.float32)

# current packing: [B, R, 128]
cur = np.zeros((B, R * 128), np.float32)
cur[:, PAD:PAD + F] = buf
cur = cur.reshape(B, R, 128)

# overlap packing: stride 124, width 128
S = 124
R2 = -(-(PAD + F + 3) // S) + 1
ovl = np.zeros((B, (R2 - 1) * S + 128 + S), np.float32)
ovl[:, PAD:PAD + F] = buf
idx = (np.arange(R2)[:, None] * S + np.arange(128)[None, :])
ovl = np.ascontiguousarray(ovl[:, idx])  # [B, R2, 128]

pos = rng.uniform(1.0, F - 3.0, size=(B, NC * CHUNK)).astype(np.float32)
kil_all = (np.floor(pos).astype(np.int32) - 1 + PAD)
frac_all = (pos - np.floor(pos)).astype(np.float32)

cur_j = jnp.asarray(cur)
ovl_j = jnp.asarray(ovl)
kil_j = jnp.asarray(kil_all)
frac_j = jnp.asarray(frac_all)

rows = jnp.arange(R - 1, dtype=jnp.int32)
rows2 = jnp.arange(R2, dtype=jnp.int32)
taps256 = jnp.arange(256, dtype=jnp.int32)
taps128 = jnp.arange(128, dtype=jnp.int32)


def weights(frac):
    f = frac[:, None]
    f2 = f * f
    f3 = f2 * f
    return (f2 - 0.5 * (f + f3), 1.0 - 2.5 * f2 + 1.5 * f3,
            0.5 * f + 2.0 * f2 - 1.5 * f3, 0.5 * (f3 - f2))


def cur_read(flat, kil, frac, chunk=CHUNK, mm_only=False):
    # flat: [R, 128]
    def body(args):
        kc, fc = args
        hi = kc >> 7
        lo = kc & 127
        oh = (hi[:, None] == rows).astype(jnp.float32)
        w0 = jnp.matmul(oh, flat[:-1], precision=HI)
        w1 = jnp.matmul(oh, flat[1:], precision=HI)
        if mm_only:
            return w0.sum(-1) + w1.sum(-1)
        win = jnp.concatenate([w0, w1], axis=1)  # [C, 256]
        o = taps256[None, :] - lo[:, None]
        wm1, wy0, wy1, wy2 = weights(fc)
        w = (jnp.where(o == 0, wm1, 0.0) + jnp.where(o == 1, wy0, 0.0)
             + jnp.where(o == 2, wy1, 0.0) + jnp.where(o == 3, wy2, 0.0))
        return jnp.sum(w * win, axis=1)
    nc = kil.shape[0] // chunk
    return jax.lax.map(body, (kil.reshape(nc, chunk),
                              frac.reshape(nc, chunk))).reshape(-1)


def ovl_read(flat, kil, frac, chunk=CHUNK, mm_only=False):
    # flat: [R2, 128], rows at stride 124; all 4 taps inside one row
    def body(args):
        kc, fc = args
        hi = kc // S
        lo = kc - hi * S
        oh = (hi[:, None] == rows2).astype(jnp.float32)
        win = jnp.matmul(oh, flat, precision=HI)  # [C, 128]
        if mm_only:
            return win.sum(-1)
        o = taps128[None, :] - lo[:, None]
        wm1, wy0, wy1, wy2 = weights(fc)
        w = (jnp.where(o == 0, wm1, 0.0) + jnp.where(o == 1, wy0, 0.0)
             + jnp.where(o == 2, wy1, 0.0) + jnp.where(o == 3, wy2, 0.0))
        return jnp.sum(w * win, axis=1)
    nc = kil.shape[0] // chunk
    return jax.lax.map(body, (kil.reshape(nc, chunk),
                              frac.reshape(nc, chunk))).reshape(-1)


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
    return out


a = timeit("A_cur", jax.vmap(cur_read), (cur_j, kil_j, frac_j))
timeit("B_cur_mmonly",
       jax.vmap(lambda f, k, fr: cur_read(f, k, fr, mm_only=True)),
       (cur_j, kil_j, frac_j))
c = timeit("C_ovl", jax.vmap(ovl_read), (ovl_j, kil_j, frac_j))
timeit("D_ovl_mmonly",
       jax.vmap(lambda f, k, fr: ovl_read(f, k, fr, mm_only=True)),
       (ovl_j, kil_j, frac_j))
timeit("E_ovl_c8192",
       jax.vmap(lambda f, k, fr: ovl_read(f, k, fr, chunk=8192)),
       (ovl_j, kil_j, frac_j))
diff = float(jnp.max(jnp.abs(a - c)))
print(json.dumps({"max_abs_A_vs_C": diff}), flush=True)
