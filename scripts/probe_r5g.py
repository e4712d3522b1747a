"""Round-5g: (a) true follower/gate kernel cost with DEVICE-RESIDENT
inputs (probe_follower2 passed numpy and measured H2D transfer, not the
kernel); (b) cumulative mastering prefix decomposition."""
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

from phonic_tpu.ops import follower as fo


def timeit(fn, args, min_iters=5, min_secs=1.0):
    out = fn(*args)
    jax.block_until_ready(out)
    iters = 0
    t0 = time.perf_counter()
    while True:
        out = fn(*args)
        iters += 1
        if iters >= min_iters and time.perf_counter() - t0 > min_secs:
            break
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def kernels():
    n = 131072
    rng = np.random.default_rng(3)
    x = jax.device_put(rng.standard_normal((1, n)).astype(np.float32) * 20 - 40)
    aa = jax.device_put(np.full((1, n), 0.01, np.float32))
    ra = jax.device_put(np.full((1, n), 0.002, np.float32))
    env0 = jax.device_put(np.asarray([-60.0], np.float32))
    jax.block_until_ready((x, aa, ra, env0))
    ms = timeit(lambda *a: fo._follower_call(*a, tc=2048), (x, aa, ra, env0))
    print(json.dumps({"follower_devres_ms": round(ms, 2),
                      "ns_per_step": round(ms * 1e6 / n, 1)}), flush=True)
    thr = jax.device_put(np.full((1, n), -40.0, np.float32))
    rngd = jax.device_put(np.full((1, n), -90.0, np.float32))
    hs = jax.device_put(np.full((1, n), 4800.0, np.float32))
    st0 = jax.device_put(np.zeros((1, 3), np.float32))
    ms = timeit(lambda *a: fo._gate_call(*a, tc=1024),
                (x, aa, ra, thr, rngd, hs, st0))
    print(json.dumps({"gate_devres_ms": round(ms, 2),
                      "ns_per_step": round(ms * 1e6 / n, 1)}), flush=True)


def mastering(tag, keep):
    from phonic_tpu import (EngineConfig, FilePlaybackOptions, FileSource,
                            Mixer, RenderProgram, AudioFileBuffer)
    from phonic_tpu.effects.gate import GateEffect
    from phonic_tpu.effects.compressor import CompressorEffect
    from phonic_tpu.effects.delay import DelayEffect
    from phonic_tpu.effects.distortion import DistortionEffect
    rng = np.random.default_rng(0)
    m = Mixer("main")
    for i in range(4):
        t = np.arange(48000) / 48000
        f = float(rng.uniform(100, 500))
        x = (0.5 * np.sin(2 * np.pi * f * t) * np.exp(-t * 2.0)).astype(np.float32)
        m.add_source(FileSource(AudioFileBuffer.from_array(x[None, :], 48000),
                                FilePlaybackOptions(volume=0.4, repeat=None)))
    if "gate" in keep:
        m.add_effect(GateEffect(threshold=-40.0))
    if "comp" in keep:
        m.add_effect(CompressorEffect(threshold=-12.0, ratio=4.0))
    if "delay" in keep:
        m.add_effect(DelayEffect(delay_ms=300.0, feedback=0.4, wet=0.3,
                                 max_delay_capacity_ms=1000.0))
    if "dist" in keep:
        m.add_effect(DistortionEffect("Diode", drive=1.0, mix=0.3))
    if "lim" in keep:
        m.add_effect(CompressorEffect.limiter())
    prog = RenderProgram(m, EngineConfig(sample_rate=48000,
                                         block_frames=131072))
    state = prog.init_state()
    inputs = prog.packed_block_inputs(0)
    state, audio = prog.step_packed(state, inputs)
    jax.block_until_ready(audio)
    ms = timeit(lambda s, i: prog.step_packed(s, i)[1], (state, inputs))
    print(json.dumps({f"mastp_{tag}_ms": round(ms, 1)}), flush=True)


PREFIXES = [
    ("g", {"gate"}),
    ("gc", {"gate", "comp"}),
    ("gcd", {"gate", "comp", "delay"}),
    ("gcdd", {"gate", "comp", "delay", "dist"}),
    ("gcddl", {"gate", "comp", "delay", "dist", "lim"}),
]

for arg in sys.argv[1:] or ["kernels"] + [p[0] for p in PREFIXES]:
    try:
        if arg == "kernels":
            kernels()
        else:
            mastering(arg, dict(PREFIXES)[arg])
    except Exception as e:  # noqa: BLE001
        print(json.dumps({arg + "_error": repr(e)[:300]}), flush=True)
