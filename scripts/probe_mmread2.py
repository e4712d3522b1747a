"""Second-stage bisection: exact hermite_read_mm variants (full real code,
ramp positions, [lanes, src] double-vmap like the engine).  Run ALONE."""
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
PAD = 4
N = 131072
FRAMES = 12000
rng = np.random.default_rng(0)
buf = rng.normal(size=(1, FRAMES)).astype(np.float32)  # mono


def pack_old(a):
    frames = a.shape[-1]
    rows_data = -(-(PAD + frames) // 128)
    r = rows_data + 1
    out = np.zeros(a.shape[:-1] + (r * 128,), np.float32)
    out[..., PAD:PAD + frames] = a
    out = out.reshape(a.shape[:-1] + (r, 128))
    return np.ascontiguousarray(np.moveaxis(out, -3, -1))  # [R, 128, ch]


def read_old(bufmm, positions, chunk=2048):
    r = bufmm.shape[-3]
    ch = bufmm.shape[-1]
    pos = jnp.asarray(positions, jnp.float32)
    n = pos.shape[-1]
    k = jnp.floor(pos)
    frac = pos - k
    kil = k.astype(jnp.int32) - 1 + PAD
    lim = 128 * (r - 1) - 1
    valid = (kil >= 0) & (kil <= lim)
    kil = jnp.clip(kil, 0, lim)
    c = int(min(chunk, n))
    nc = n // c
    flat = bufmm.reshape(r, 128 * ch)
    rows = jnp.arange(r - 1, dtype=jnp.int32)
    taps = jnp.arange(256, dtype=jnp.int32)

    def body(args):
        kil_c, frac_c = args
        hi = kil_c >> 7
        lo = kil_c & 127
        oh = (hi[:, None] == rows).astype(flat.dtype)
        w0 = jnp.matmul(oh, flat[:-1], precision=HI)
        w1 = jnp.matmul(oh, flat[1:], precision=HI)
        win = jnp.concatenate(
            [w0.reshape(c, 128, ch), w1.reshape(c, 128, ch)], axis=1)
        o = taps[None, :] - lo[:, None]
        f = frac_c[:, None]
        f2 = f * f
        f3 = f2 * f
        w_m1 = f2 - 0.5 * (f + f3)
        w_y0 = 1.0 - 2.5 * f2 + 1.5 * f3
        w_y1 = 0.5 * f + 2.0 * f2 - 1.5 * f3
        w_y2 = 0.5 * (f3 - f2)
        w = (jnp.where(o == 0, w_m1, 0.0) + jnp.where(o == 1, w_y0, 0.0)
             + jnp.where(o == 2, w_y1, 0.0) + jnp.where(o == 3, w_y2, 0.0))
        return jnp.sum(w[:, :, None] * win, axis=1)

    outs = jax.lax.map(body, (kil.reshape(nc, c), frac.reshape(nc, c)))
    out = outs.reshape(n, ch)
    out = jnp.where(valid[:, None], out, 0.0)
    return out.T


from phonic_tpu.ops import resample as rs  # HEAD implementation


def run(tag, packed, readfn, lanes, reps=5):
    # [lanes, src, ...] double vmap; ramp positions with per-src speed
    src = 16
    speeds = rng.uniform(0.5, 2.0, size=(lanes, src)).astype(np.float32)
    pos = (np.arange(N, dtype=np.float32)[None, None, :]
           * speeds[:, :, None]) % (FRAMES - 2)
    packed_b = jnp.asarray(np.broadcast_to(
        np.asarray(packed), (lanes, src) + np.asarray(packed).shape).copy())
    posj = jnp.asarray(pos)

    fn = jax.jit(jax.vmap(jax.vmap(readfn)))
    t0 = time.perf_counter()
    out = fn(packed_b, posj)
    jax.block_until_ready(out)
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(packed_b, posj)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1000.0
    print(json.dumps({f"{tag}_x{lanes}_ms": round(ms, 2),
                      f"{tag}_x{lanes}_comp_s": round(comp, 1)}), flush=True)


p_old = pack_old(buf)
p_new = rs.mm_pack(buf)
for lanes in (1, 16):
    run("old", p_old, read_old, lanes)
    run("new", p_new, rs.hermite_read_mm, lanes)
