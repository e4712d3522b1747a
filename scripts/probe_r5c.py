"""Round-5 mixer_graph decomposition: which of the 18.6 ms is reads vs
each effect family, now that sources ride the Pallas ramp-read."""
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


def build(effects):
    """effects: subset of {"eq5", "chorus", "reverb", "gain"}."""
    from phonic_tpu import (EngineConfig, FilePlaybackOptions, FileSource,
                            Mixer, RenderProgram)
    from phonic_tpu.effects.eq5 import Eq5Effect
    from phonic_tpu.effects.chorus import ChorusEffect
    from phonic_tpu.effects.reverb import ReverbEffect
    from phonic_tpu.effects.gain import GainEffect
    from phonic_tpu import AudioFileBuffer
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
        main.add_effect(ReverbEffect(room_size=0.6, wet=0.2))
    if "gain" in effects:
        main.add_effect(GainEffect(gain=0.8))
    return RenderProgram(main, EngineConfig(sample_rate=48000,
                                            block_frames=131072))


def measure(tag, effects, min_iters=5, min_secs=1.0):
    prog = build(effects)
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
    ms = (time.perf_counter() - t0) / iters * 1000.0
    print(json.dumps({tag + "_ms": round(ms, 2),
                      tag + "_compile_s": round(compile_s, 1)}), flush=True)


CASES = {
    "sources_only": set(),
    "eq5": {"eq5"},
    "chorus": {"chorus"},
    "reverb": {"reverb"},
    "full": {"eq5", "chorus", "reverb", "gain"},
}

for tag in sys.argv[1:] or list(CASES):
    try:
        measure(tag, CASES[tag])
    except Exception as e:  # noqa: BLE001
        print(json.dumps({tag + "_error": repr(e)[:300]}), flush=True)
