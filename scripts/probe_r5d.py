"""Round-5 decompositions: (a) granular_1k by phase (alloc / read / mix),
via monkeypatching each phase to a cheap stub; (b) mastering_chain by
effect."""
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

import bench
from phonic_tpu.generators import sampler as smod
from phonic_tpu.generators import granular as gmod


def measure(prog, min_iters=5, min_secs=1.0):
    state = prog.init_state()
    inputs = prog.packed_block_inputs(0)
    t0 = time.perf_counter()
    state, audio = prog.step_packed(state, inputs)
    jax.block_until_ready(audio)
    compile_s = time.perf_counter() - t0
    iters = 0
    t0 = time.perf_counter()
    while True:
        state, audio = prog.step_packed(state, inputs)
        iters += 1
        if iters >= min_iters and time.perf_counter() - t0 > min_secs:
            break
    jax.block_until_ready(audio)
    return (time.perf_counter() - t0) / iters * 1000.0, compile_s


def gran(tag, patch):
    real_rr = smod.rr.ramp_read
    real_mix = gmod.grain_mix
    real_alloc = gmod.granular_voice_alloc
    try:
        if patch == "noread":
            smod.rr.ramp_read = lambda src, smap, pos, smax, **kw: (
                jnp.zeros((pos.shape[0], src.shape[1], pos.shape[1]),
                          jnp.float32))
        elif patch == "nomix":
            gmod.grain_mix = lambda s, g, g_pan: jnp.zeros(
                (2, s.shape[-1]), jnp.float32)
        elif patch == "noalloc":
            def fake_alloc(gs, frame0, n, **kw):
                pool = gs["g_trig"].shape[0]
                z = jnp.zeros((pool, n), jnp.float32)
                return gs, z + 2.0, z + 0.5  # in-range positions, flat env
            gmod.granular_voice_alloc = fake_alloc
        ms, cs = measure(bench.config_granular_1k())
        print(json.dumps({f"gran_{tag}_ms": round(ms, 1),
                          f"gran_{tag}_compile_s": round(cs, 1)}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({f"gran_{tag}_error": repr(e)[:300]}), flush=True)
    finally:
        smod.rr.ramp_read = real_rr
        gmod.grain_mix = real_mix
        gmod.granular_voice_alloc = real_alloc


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
    try:
        ms, cs = measure(prog)
        print(json.dumps({f"mast_{tag}_ms": round(ms, 1),
                          f"mast_{tag}_compile_s": round(cs, 1)}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({f"mast_{tag}_error": repr(e)[:300]}), flush=True)


CASES = {
    "gran_full": lambda: gran("full", None),
    "gran_noread": lambda: gran("noread", "noread"),
    "gran_nomix": lambda: gran("nomix", "nomix"),
    "gran_noalloc": lambda: gran("noalloc", "noalloc"),
    "mast_none": lambda: mastering("none", set()),
    "mast_gate": lambda: mastering("gate", {"gate"}),
    "mast_comp": lambda: mastering("comp", {"comp"}),
    "mast_delay": lambda: mastering("delay", {"delay"}),
    "mast_dist": lambda: mastering("dist", {"dist"}),
    "mast_lim": lambda: mastering("lim", {"lim"}),
}

for tag in sys.argv[1:] or list(CASES):
    CASES[tag]()
