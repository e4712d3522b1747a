"""Real-mode profile of the headline bench config: where does wall time go?

Separates relay RTT, host->device input transfer, and device compute.
Run strictly alone (CLAUDE.md: bench needs an idle host).
"""
import json
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/phonic_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import bench as B

    res = {}

    # force real execution FIRST (see CLAUDE.md THE SPECULATOR)
    np.asarray(jax.jit(lambda: jnp.zeros(2))())

    # 1) raw dispatch RTT (trivial program, device-resident arg)
    f = jax.jit(lambda x: x + 1.0)
    x = jax.device_put(np.zeros(8, np.float32))
    jax.block_until_ready(f(x))
    t0 = time.perf_counter()
    for _ in range(20):
        jax.block_until_ready(f(x))
    res["rtt_ms"] = round((time.perf_counter() - t0) / 20 * 1e3, 2)
    print("rtt_ms", res["rtt_ms"], flush=True)

    # 1b) chained async dispatches then one sync: does the relay pipeline?
    t0 = time.perf_counter()
    y = x
    for _ in range(20):
        y = f(y)
    jax.block_until_ready(y)
    res["rtt_chained_ms"] = round((time.perf_counter() - t0) / 20 * 1e3, 2)
    print("rtt_chained_ms", res["rtt_chained_ms"], flush=True)

    # 2) H2D bandwidth estimate: 8 MB device_put
    big = np.zeros(2 * 1024 * 1024, np.float32)
    jax.block_until_ready(jax.device_put(big))
    t0 = time.perf_counter()
    for _ in range(3):
        jax.block_until_ready(jax.device_put(big))
    dt = (time.perf_counter() - t0) / 3
    res["h2d_MBps"] = round(big.nbytes / dt / 1e6, 1)
    print("h2d_MBps", res["h2d_MBps"], flush=True)

    # 3) headline config single lane
    prog = B.config_mixer_graph()
    state = prog.init_state()
    packed = prog.packed_block_inputs(0)
    res["packed_KB"] = round(sum(v.nbytes for v in packed.values()) / 1e3, 1)
    res["state_KB"] = round(sum(np.asarray(l).nbytes
                                for l in jax.tree.leaves(state)) / 1e3, 1)
    res["n_state_leaves"] = len(jax.tree.leaves(state))
    print("packed_KB", res["packed_KB"], "state_KB", res["state_KB"],
          "leaves", res["n_state_leaves"], flush=True)

    t0 = time.perf_counter()
    st, au = prog.step_packed(state, packed)
    jax.block_until_ready(au)
    res["compile_s"] = round(time.perf_counter() - t0, 1)
    print("compile_s", res["compile_s"], flush=True)

    def timeit(fn, iters=5):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    # (a) exactly what bench.py does today: host numpy packed every call,
    # fresh state threading
    st2 = st
    def step_host():
        nonlocal st2
        st2, a = prog.step_packed(st2, packed)
        return a
    dt = timeit(step_host)
    res["step_hostpacked_ms"] = round(dt * 1e3, 1)
    print("step_hostpacked_ms", res["step_hostpacked_ms"], flush=True)

    # (b) device-resident packed inputs
    packed_dev = jax.device_put(packed)
    st3 = st
    def step_dev():
        nonlocal st3
        st3, a = prog.step_packed(st3, packed_dev)
        return a
    dt = timeit(step_dev)
    res["step_devpacked_ms"] = round(dt * 1e3, 1)
    print("step_devpacked_ms", res["step_devpacked_ms"], flush=True)

    blk_s = prog.ctx.block_frames / prog.ctx.sample_rate
    res["block_audio_s"] = blk_s
    res["x_rt_hostpacked"] = round(blk_s / (res["step_hostpacked_ms"] / 1e3), 1)
    res["x_rt_devpacked"] = round(blk_s / (res["step_devpacked_ms"] / 1e3), 1)
    print(json.dumps(res, indent=1), flush=True)
    with open("/tmp/profile_real.json", "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
