"""Round-4 real-mode decomposition + hardware ceilings.

Two question sets:
  A. What can the tunneled chip actually do?  (matmul TFLOP/s, elementwise
     GB/s, chained-dispatch floor, lax.scan per-step fixed cost, and —
     crucially — whether vmapped lanes parallelize or serialize.)
  B. Where do the ~150-180 ms per 131072-frame block go in the CURRENT
     engine?  (full step vs sources-only vs each effect standalone vs
     smoothing vs the FileBatch read.)

Run strictly alone (CLAUDE.md).  Streams results to /tmp/profile_r4b.json.
"""
import json
import sys
import time

import numpy as np

RES = {}


def save():
    with open("/tmp/profile_r4b.json", "w") as f:
        json.dump(RES, f, indent=1)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/phonic_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    sys.path.insert(0, "/root/repo")

    np.asarray(jax.jit(lambda: jnp.zeros(2))())  # force real mode FIRST
    print("real mode forced", flush=True)

    def timeit(fn, *args, iters=5):
        out = fn(*args)
        jax.block_until_ready(out)  # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3  # ms

    def rec(key, ms, extra=""):
        RES[key] = round(ms, 3)
        save()
        print(key, RES[key], "ms", extra, flush=True)

    # ---- A. hardware ceilings -------------------------------------------
    rng = np.random.default_rng(0)

    # chained dispatch floor
    f = jax.jit(lambda x: x + 1.0)
    x8 = jax.device_put(np.zeros(8, np.float32))
    jax.block_until_ready(f(x8))
    t0 = time.perf_counter()
    y = x8
    for _ in range(50):
        y = f(y)
    jax.block_until_ready(y)
    rec("chain_dispatch_ms", (time.perf_counter() - t0) / 50 * 1e3)

    # bf16 matmul peak: 4096^3 = 137 GFLOP
    a = jax.device_put(rng.standard_normal((4096, 4096)).astype(np.float32).astype(jnp.bfloat16))
    mm = jax.jit(lambda a: a @ a)
    ms = timeit(mm, a)
    rec("matmul_bf16_4096_ms", ms, f"= {2*4096**3/ms/1e9:.1f} TFLOP/s")
    RES["matmul_bf16_TFLOPs"] = round(2 * 4096**3 / ms / 1e9, 1)

    # f32 matmul 2048^3 = 17 GFLOP
    a2 = jax.device_put(rng.standard_normal((2048, 2048)).astype(np.float32))
    mmf = jax.jit(lambda a: jnp.matmul(a, a, precision=jax.lax.Precision.HIGHEST))
    ms = timeit(mmf, a2)
    rec("matmul_f32hi_2048_ms", ms, f"= {2*2048**3/ms/1e9:.1f} TFLOP/s")

    # elementwise bandwidth: 64M f32, ~768 MB traffic
    big = jax.device_put(rng.standard_normal(64 * 1024 * 1024).astype(np.float32))
    ew = jax.jit(lambda x: x * 1.01 + 0.5)
    ms = timeit(ew, big)
    rec("elementwise_64M_ms", ms, f"= {2*big.nbytes/ms/1e6:.0f} GB/s")

    # vmap lane scaling: a chorus-ish body (sin LFO + assoc-scan IIR) on
    # [L, 2, 131072] for L = 1 vs 16.  If 16 lanes cost ~16x, lanes
    # serialize and batching can't rescue throughput.
    T = 131072

    def body(x):
        lfo = jnp.sin(jnp.arange(T, dtype=jnp.float32) * 0.001)[None, :]
        y = x * (1.0 + 0.3 * lfo)
        def comb(p, q):
            return (p[0] * q[0], q[0] * p[1] + q[1])
        a = jnp.full_like(y, 0.99)
        return jax.lax.associative_scan(comb, (a, y), axis=-1)[1]

    for L in (1, 16):
        xl = jax.device_put(rng.standard_normal((L, 2, T)).astype(np.float32) * 0.1)
        ms = timeit(jax.jit(jax.vmap(body)), xl)
        rec(f"vmap_body_x{L}_ms", ms)

    # matmul lane scaling: [L, 512, 512] @ [L, 512, 512]
    for L in (1, 16):
        al = jax.device_put(rng.standard_normal((L, 512, 512)).astype(np.float32))
        ms = timeit(jax.jit(lambda a: jnp.einsum("lij,ljk->lik", a, a)), al)
        rec(f"bmm512_x{L}_ms", ms)

    # lax.scan per-step fixed cost at equal total work: 131072 frames of a
    # leaky integrator over [2, sub] sub-blocks, sub in {1024, 8192, 32768}
    for sub in (1024, 8192, 32768):
        steps = T // sub
        xs = jax.device_put(rng.standard_normal((steps, 2, sub)).astype(np.float32))

        @jax.jit
        def scf(xs):
            def bd(c, u):
                y = jnp.cumsum(u, axis=-1) * 0.01 + c[:, None]
                return y[:, -1], y
            _, ys = jax.lax.scan(bd, jnp.zeros(2), xs)
            return ys
        ms = timeit(scf, xs)
        rec(f"scan_sub{sub}_steps{steps}_ms", ms)

    # ---- B. current-engine decomposition --------------------------------
    import bench as B

    def time_prog(key, prog, iters=5):
        state = prog.init_state()
        packed = prog.packed_block_inputs(0)
        t0 = time.perf_counter()
        st, au = prog.step_packed(state, packed)
        jax.block_until_ready(au)
        RES[key + "_compile_s"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        for _ in range(iters):
            st, au = prog.step_packed(st, packed)
        jax.block_until_ready(au)
        ms = (time.perf_counter() - t0) / iters * 1e3
        audio_s = prog.ctx.block_frames / prog.ctx.sample_rate
        RES[key + "_x_rt"] = round(audio_s / (ms / 1e3), 1)
        rec(key + "_ms", ms, f"= {RES[key + '_x_rt']}x rt")

    time_prog("full_16src", B.config_mixer_graph())

    # sources-only variant of the headline graph
    from phonic_tpu import (EngineConfig, FilePlaybackOptions, FileSource,
                            Mixer, RenderProgram)
    rng2 = np.random.default_rng(0)
    main_m = Mixer("main")
    subs = [main_m.add_mixer(Mixer(f"sub{i}")) for i in range(4)]
    for i in range(16):
        buf = B._tone(frames=12000 + 977 * i, freq=float(rng2.uniform(80, 660)))
        subs[i % 4].add_source(FileSource(buf, FilePlaybackOptions(
            volume=float(rng2.uniform(0.2, 0.6)),
            panning=float(rng2.uniform(-0.8, 0.8)),
            speed=float(rng2.uniform(0.5, 2.0)), repeat=None)))
    time_prog("noeffects_16src",
              RenderProgram(main_m, EngineConfig(sample_rate=48000,
                                                 block_frames=T)))

    # other BASELINE configs, single block
    time_prog("sampler_64v", B.config_sampler_64())
    time_prog("granular_1k", B.config_granular_1k())
    time_prog("mastering", B.config_mastering())

    # each effect standalone on [2, T] (current code)
    from phonic_tpu.graph.nodes import BuildCtx
    ctx = BuildCtx(sample_rate=48000, channels=2, block_frames=T, max_events=8)
    from phonic_tpu.effects.eq5 import Eq5Effect
    from phonic_tpu.effects.chorus import ChorusEffect
    from phonic_tpu.effects.reverb import ReverbEffect
    from phonic_tpu.effects.gain import GainEffect
    from phonic_tpu.effects.delay import DelayEffect
    from phonic_tpu.effects.compressor import CompressorEffect
    from phonic_tpu.effects.gate import GateEffect
    from phonic_tpu.effects.distortion import DistortionEffect
    from phonic_tpu.effects.filter import FilterEffect

    x = jax.device_put((rng.standard_normal((2, T)) * 0.1).astype(np.float32))
    for eff in (GainEffect(gain=0.8), Eq5Effect(gains=[1, -2, 3, -1, 2]),
                ChorusEffect(rate=1.0), ReverbEffect(room_size=0.6, wet=0.2),
                DelayEffect(delay_ms=300.0, feedback=0.4, wet=0.3),
                CompressorEffect(threshold=-12.0, ratio=4.0),
                GateEffect(threshold=-40.0),
                DistortionEffect("Diode", drive=1.0, mix=0.3),
                FilterEffect("Lowpass", cutoff=2000.0)):
        name = type(eff).__name__
        if isinstance(eff, DistortionEffect):
            name = "Distortion"
        try:
            eff.prepare(ctx)
            st = eff.init_state(ctx)
            init = eff.param_initials()
            params = {k: jnp.full((T,), np.float32(v)) for k, v in init.items()}
            params["_frame0"] = jnp.int32(0)
            step = jax.jit(lambda s, xx, p, e=eff: e.process(s, xx, p, ctx))
            rec(f"eff_{name}_ms", timeit(step, st, x, params))
        except Exception as ex:
            RES[f"eff_{name}_ms"] = f"error: {ex}"
            save()
            print(name, "ERROR", ex, flush=True)

    # smoothing + FileBatch of the headline graph
    prog = B.config_mixer_graph()
    state = prog.init_state()
    inputs = prog.block_inputs(0)
    sm = jax.jit(lambda s, p: prog._smooth_all_params(s, p))
    rec("smooth_ms", timeit(sm, state["smoothers"], inputs["params"]))

    (gid, batch), = prog.file_batches.items()
    S = len(batch.paths)
    fb_state = state["file_batches"][gid]
    frame0 = jnp.int32(0)
    ones = jnp.ones((S, T), jnp.float32)
    stops = jnp.full((S,), 10**9, jnp.int32)
    zS = jnp.zeros((S,), jnp.float32)
    fb = jax.jit(lambda st: batch.render(
        st, frame0, ones * 0.5, ones * 0.0, ones * 1.3, stops, stops, zS, zS))
    rec("filebatch16_ms", timeit(fb, fb_state))

    print(json.dumps(RES, indent=1), flush=True)


if __name__ == "__main__":
    main()
