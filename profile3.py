"""Which part of the headline graph costs 1.3 s? Sources-only variants."""
import json
import time

import numpy as np


def build_graph(effects=True, nsrc=16, block=131072):
    from phonic_tpu import (EngineConfig, FilePlaybackOptions, FileSource,
                            Mixer, RenderProgram)
    from phonic_tpu.effects.eq5 import Eq5Effect
    from phonic_tpu.effects.chorus import ChorusEffect
    from phonic_tpu.effects.reverb import ReverbEffect
    from phonic_tpu.effects.gain import GainEffect
    from bench import _tone
    rng = np.random.default_rng(0)
    main = Mixer("main")
    subs = [main.add_mixer(Mixer(f"sub{i}")) for i in range(4)]
    for i in range(nsrc):
        buf = _tone(frames=12000 + 977 * i, freq=float(rng.uniform(80, 660)))
        subs[i % 4].add_source(FileSource(buf, FilePlaybackOptions(
            volume=float(rng.uniform(0.2, 0.6)),
            panning=float(rng.uniform(-0.8, 0.8)),
            speed=float(rng.uniform(0.5, 2.0)), repeat=None)))
    if effects:
        for s in subs:
            s.add_effect(Eq5Effect(gains=list(rng.uniform(-6, 6, 5))))
            s.add_effect(ChorusEffect(rate=float(rng.uniform(0.3, 2.0))))
        main.add_effect(ReverbEffect(room_size=0.6, wet=0.2))
        main.add_effect(GainEffect(gain=0.8))
    return RenderProgram(main, EngineConfig(sample_rate=48000,
                                            block_frames=block))


def time_prog(prog, iters=5):
    import jax
    state = prog.init_state()
    packed = prog.packed_block_inputs(0)
    t0 = time.perf_counter()
    st, au = prog.step_packed(state, packed)
    jax.block_until_ready(au)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        st, au = prog.step_packed(st, packed)
    jax.block_until_ready(au)
    return compile_s, (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/phonic_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    res = {}
    np.asarray(jax.jit(lambda: jnp.zeros(2))())

    for name, kw in (("noeffects_16src", dict(effects=False)),
                     ("noeffects_1src", dict(effects=False, nsrc=1)),
                     ("full_16src", dict(effects=True))):
        c, ms = time_prog(build_graph(**kw))
        res[name] = {"compile_s": round(c, 1), "step_ms": round(ms, 1)}
        print(name, res[name], flush=True)

    with open("/tmp/profile3.json", "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
