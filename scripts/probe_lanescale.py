"""Which component of the 16-src headline graph scales linearly with
vmapped lanes?  Cumulative variants at x1 and x16."""
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

from phonic_tpu.parallel.mesh import BatchedRenderProgram


def build(with_eq=False, with_chorus=False, with_reverb=False):
    from phonic_tpu import (EngineConfig, FilePlaybackOptions, FileSource,
                            Mixer, RenderProgram)
    from phonic_tpu.effects.eq5 import Eq5Effect
    from phonic_tpu.effects.chorus import ChorusEffect
    from phonic_tpu.effects.reverb import ReverbEffect
    import bench
    rng = np.random.default_rng(0)
    main = Mixer("main")
    subs = [main.add_mixer(Mixer(f"sub{i}")) for i in range(4)]
    for i in range(16):
        buf = bench._tone(frames=12000 + 977 * i, freq=float(rng.uniform(80, 660)))
        subs[i % 4].add_source(FileSource(buf, FilePlaybackOptions(
            volume=float(rng.uniform(0.2, 0.6)),
            panning=float(rng.uniform(-0.8, 0.8)),
            speed=float(rng.uniform(0.5, 2.0)), repeat=None)))
    for s in subs:
        if with_eq:
            s.add_effect(Eq5Effect(gains=list(rng.uniform(-6, 6, 5))))
        if with_chorus:
            s.add_effect(ChorusEffect(rate=float(rng.uniform(0.3, 2.0))))
    if with_reverb:
        main.add_effect(ReverbEffect(room_size=0.6, wet=0.2))
    return RenderProgram(main, EngineConfig(sample_rate=48000,
                                            block_frames=131072))


def measure(tag, lanes, **kw):
    prog = build(**kw)
    if lanes == 1:
        state = prog.init_state()
        inputs = prog.packed_block_inputs(0)
        step = prog.step_packed
    else:
        b = BatchedRenderProgram(prog, lanes=lanes)
        state = b.init_states()
        inputs = b.block_inputs(0)
        step = b.step
    state, audio = step(state, inputs)
    jax.block_until_ready(audio)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        state, audio = step(state, inputs)
    jax.block_until_ready(audio)
    ms = (time.perf_counter() - t0) / reps * 1000.0
    print(json.dumps({f"{tag}_x{lanes}_ms": round(ms, 1)}), flush=True)


if __name__ == "__main__":
    for tag, kw in (("bare", {}),
                    ("eq", dict(with_eq=True)),
                    ("eqch", dict(with_eq=True, with_chorus=True)),
                    ("full", dict(with_eq=True, with_chorus=True,
                                  with_reverb=True))):
        for lanes in (1, 16):
            try:
                measure(tag, lanes, **kw)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({f"{tag}_x{lanes}_error": repr(e)[:200]}),
                      flush=True)
