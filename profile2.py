"""Real-mode decomposition: per-step lax.scan cost, gather cost, and each
headline effect standalone on a [2, 131072] block."""
import json
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/phonic_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    res = {}
    np.asarray(jax.jit(lambda: jnp.zeros(2))())  # force real mode

    def timeit(fn, *args, iters=5):
        out = fn(*args)
        jax.block_until_ready(out)  # compile
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3  # ms

    T = 131072
    x = jax.device_put(np.random.default_rng(0)
                       .standard_normal((2, T)).astype(np.float32) * 0.1)

    # trivial lax.scan per-step cost at several lengths
    for steps in (128, 2048, 131072):
        xs = jax.device_put(np.zeros((steps, 2), np.float32))
        @jax.jit
        def f(xs):
            def body(c, u):
                c = c * 0.99 + u
                return c, c
            _, ys = jax.lax.scan(body, jnp.zeros(2), xs)
            return ys
        ms = timeit(f, xs)
        res[f"scan_{steps}_ms"] = round(ms, 3)
        print(f"scan_{steps}_ms", res[f"scan_{steps}_ms"], flush=True)

    # associative scan over the block
    @jax.jit
    def assoc(a, b):
        def comb(p, q):
            return (p[0] * q[0], q[0] * p[1] + q[1])
        return jax.lax.associative_scan(comb, (a, b), axis=-1)[1]
    a = jax.device_put(np.full((2, T), 0.99, np.float32))
    res["assoc_scan_ms"] = round(timeit(assoc, a, x), 3)
    print("assoc_scan_ms", res["assoc_scan_ms"], flush=True)

    # gather: T 4-tap Hermite-style reads from a 48000 table
    tbl = jax.device_put(np.random.default_rng(1)
                         .standard_normal(48000).astype(np.float32))
    idx = jax.device_put((np.random.default_rng(2).uniform(1, 47000, T))
                         .astype(np.float32))
    @jax.jit
    def herm(tbl, pos):
        i = jnp.floor(pos).astype(jnp.int32)
        f = pos - i
        y0 = tbl[i - 1]; y1 = tbl[i]; y2 = tbl[i + 1]; y3 = tbl[i + 2]
        c1 = 0.5 * (y2 - y0)
        c2 = y0 - 2.5 * y1 + 2 * y2 - 0.5 * y3
        c3 = 0.5 * (y3 - y0) + 1.5 * (y1 - y2)
        return ((c3 * f + c2) * f + c1) * f + y1
    res["hermite_gather_ms"] = round(timeit(herm, tbl, idx), 3)
    print("hermite_gather_ms", res["hermite_gather_ms"], flush=True)

    # each effect standalone
    from phonic_tpu.graph.nodes import BuildCtx
    ctx = BuildCtx(sample_rate=48000, channels=2, block_frames=T,
                   max_events=8)
    from phonic_tpu.effects.eq5 import Eq5Effect
    from phonic_tpu.effects.chorus import ChorusEffect
    from phonic_tpu.effects.reverb import ReverbEffect
    from phonic_tpu.effects.gain import GainEffect

    for eff in (GainEffect(gain=0.8), Eq5Effect(gains=[1, -2, 3, -1, 2]),
                ChorusEffect(rate=1.0), ReverbEffect(room_size=0.6, wet=0.2)):
        eff.prepare(ctx)
        st = eff.init_state(ctx)
        params = {p.id: jnp.full((T,), np.float32(
                      p.denormalize(p.normalize(p.default))
                      if hasattr(p, "denormalize") else 0.0))
                  for p in eff.PARAMS}
        # use param_initials raw values instead
        init = eff.param_initials()
        params = {k: jnp.full((T,), np.float32(v)) for k, v in init.items()}
        params["_frame0"] = jnp.int32(0)
        step = jax.jit(lambda s, x, p, e=eff: e.process(s, x, p, ctx))
        name = type(eff).__name__
        try:
            ms = timeit(step, st, x, params)
            res[f"{name}_ms"] = round(ms, 2)
        except Exception as ex:
            res[f"{name}_ms"] = f"error: {ex}"
        print(name, res[f"{name}_ms"], flush=True)

    print(json.dumps(res, indent=1), flush=True)
    with open("/tmp/profile2.json", "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
