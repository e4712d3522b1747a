"""Round-5j: mixer 'interaction gap' hunt — top-down marginals (full minus
one family at a time) + metering/bypass toggles."""
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


def build(effects, metering=True, bypass=True):
    from phonic_tpu import (EngineConfig, FilePlaybackOptions, FileSource,
                            Mixer, RenderProgram, AudioFileBuffer)
    from phonic_tpu.effects.eq5 import Eq5Effect
    from phonic_tpu.effects.chorus import ChorusEffect
    from phonic_tpu.effects.reverb import ReverbEffect
    from phonic_tpu.effects.gain import GainEffect
    rng = np.random.default_rng(0)
    main = Mixer("main")
    subs = [main.add_mixer(Mixer(f"sub{i}")) for i in range(4)]
    for i in range(16):
        frames = 12000 + 977 * i
        t = np.arange(frames) / 48000
        freq = float(rng.uniform(80, 660))
        x = (0.5 * np.sin(2 * np.pi * freq * t) * np.exp(-t * 2.0)).astype(np.float32)
        buf = AudioFileBuffer.from_array(x[None, :], 48000)
        subs[i % 4].add_source(FileSource(buf, FilePlaybackOptions(
            volume=float(rng.uniform(0.2, 0.6)),
            panning=float(rng.uniform(-0.8, 0.8)),
            speed=float(rng.uniform(0.5, 2.0)), repeat=None)))
    for s in subs:
        if "eq5" in effects:
            s.add_effect(Eq5Effect(gains=list(rng.uniform(-6, 6, 5))))
        if "chorus" in effects:
            s.add_effect(ChorusEffect(rate=float(rng.uniform(0.3, 2.0))))
    if "reverb" in effects:
        main.add_effect(ReverbEffect(room_size=0.6, wet=0.2,
                                     min_room_size=0.55))
    if "gain" in effects:
        main.add_effect(GainEffect(gain=0.8))
    cfg = EngineConfig(sample_rate=48000, block_frames=131072)
    if not metering:
        try:
            cfg = EngineConfig(sample_rate=48000, block_frames=131072,
                               metering=False)
        except TypeError:
            pass
    prog = RenderProgram(main, cfg)
    return prog


ALL = {"eq5", "chorus", "reverb", "gain"}


def measure(tag, effects):
    prog = build(effects)
    state = prog.init_state()
    inputs = prog.packed_block_inputs(0)
    t0 = time.perf_counter()
    state, audio = prog.step_packed(state, inputs)
    jax.block_until_ready(audio)
    cs = time.perf_counter() - t0
    iters = 0
    t0 = time.perf_counter()
    while True:
        state, audio = prog.step_packed(state, inputs)
        iters += 1
        if iters >= 5 and time.perf_counter() - t0 > 1.0:
            break
    jax.block_until_ready(audio)
    ms = (time.perf_counter() - t0) / iters * 1000.0
    print(json.dumps({f"mx_{tag}_ms": round(ms, 2),
                      f"mx_{tag}_compile_s": round(cs, 1)}), flush=True)


CASES = {
    "full": ALL,
    "no_eq5": ALL - {"eq5"},
    "no_chorus": ALL - {"chorus"},
    "no_reverb": ALL - {"reverb"},
    "no_gain": ALL - {"gain"},
}
for tag in sys.argv[1:] or list(CASES):
    try:
        measure(tag, CASES[tag])
    except Exception as e:  # noqa: BLE001
        print(json.dumps({tag + "_error": repr(e)[:300]}), flush=True)
