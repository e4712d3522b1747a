"""Isolate: FileBatch.render, param smoothing, effect batching on/off."""
import json
import time

import numpy as np
from profile3 import build_graph


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/phonic_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    res = {}
    np.asarray(jax.jit(lambda: jnp.zeros(2))())

    def timeit(fn, *args, iters=5):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return round((time.perf_counter() - t0) / iters * 1e3, 1)

    prog = build_graph(effects=False)
    state = prog.init_state()
    inputs = prog.block_inputs(0)

    # 1) smoothing alone
    sm = jax.jit(lambda s, p: prog._smooth_all_params(s, p))
    res["smooth_ms"] = timeit(sm, state["smoothers"], inputs["params"])
    print("smooth_ms", res["smooth_ms"], flush=True)

    # 2) FileBatch.render alone (16 lanes)
    (gid, batch), = prog.file_batches.items()
    S = len(batch.paths)
    n = prog.ctx.block_frames
    fb_state = state["file_batches"][gid]
    frame0 = jnp.int32(0)
    ones = jnp.ones((S, n), jnp.float32)
    stops = jnp.full((S,), 10**9, jnp.int32)
    zS = jnp.zeros((S,), jnp.float32)
    fb = jax.jit(lambda st: batch.render(
        st, frame0, ones * 0.5, ones * 0.0, ones * 1.3, stops, stops, zS, zS))
    res["filebatch16_ms"] = timeit(fb, fb_state)
    print("filebatch16_ms", res["filebatch16_ms"], flush=True)

    # 3) full graph, effect batching OFF
    import dataclasses
    from phonic_tpu import RenderProgram
    from phonic_tpu import EngineConfig
    p2 = build_graph(effects=True)
    p2b = RenderProgram(p2.root, dataclasses.replace(p2.config,
                                                     batch_effects=False))
    st2 = p2b.init_state()
    pk2 = p2b.packed_block_inputs(0)
    stt = [st2]
    def step():
        stt[0], a = p2b.step_packed(stt[0], pk2)
        return a
    a = step(); jax.block_until_ready(a)
    res["full_nobatch_ms"] = timeit(step)
    print("full_nobatch_ms", res["full_nobatch_ms"], flush=True)

    with open("/tmp/profile4.json", "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
