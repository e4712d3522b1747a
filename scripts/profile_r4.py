"""Round-4 real-mode profile: the scan-over-blocks x lanes headline shape.

Answers the questions VERDICT r3 left open:
  1. steady-state wall time of BatchedRenderProgram(lanes=L).scan_step with
     scan_blocks=S on the real TPU (real mode forced first);
  2. how lane count scales (is the vmapped scan's wall time ~flat in lanes?);
  3. compile times per shape through the remote relay (feeds the bench
     budget + cache-warming plan).

Run strictly alone (CLAUDE.md: bench needs an idle host).  Results stream
to /tmp/profile_r4.json after every measurement.
"""
import json
import sys
import time

import numpy as np

RES = {}


def save():
    with open("/tmp/profile_r4.json", "w") as f:
        json.dump(RES, f, indent=1)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/phonic_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    sys.path.insert(0, "/root/repo")
    import bench as B
    from phonic_tpu.parallel.mesh import BatchedRenderProgram

    # force real execution FIRST (see CLAUDE.md THE SPECULATOR)
    np.asarray(jax.jit(lambda: jnp.zeros(2))())
    print("real mode forced", flush=True)

    f = jax.jit(lambda x: x + 1.0)
    x = jax.device_put(np.zeros(8, np.float32))
    jax.block_until_ready(f(x))
    t0 = time.perf_counter()
    for _ in range(10):
        jax.block_until_ready(f(x))
    RES["rtt_ms"] = round((time.perf_counter() - t0) / 10 * 1e3, 2)
    save()
    print("rtt_ms", RES["rtt_ms"], flush=True)

    def measure(lanes, scan_blocks, iters=3):
        key = f"scan{scan_blocks}_x{lanes}"
        prog = B.config_mixer_graph()
        b = BatchedRenderProgram(prog, lanes=lanes)
        t0 = time.perf_counter()
        states = b.init_states()
        stacked = b.stacked_inputs(scan_blocks)
        RES[key + "_lower_s"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        states, audio = b.scan_step(states, stacked)
        jax.block_until_ready(audio)
        RES[key + "_compile_s"] = round(time.perf_counter() - t0, 1)
        save()
        print(key, "compile", RES[key + "_compile_s"], "s", flush=True)
        t0 = time.perf_counter()
        for _ in range(iters):
            states, audio = b.scan_step(states, stacked)
        jax.block_until_ready(audio)
        dt = (time.perf_counter() - t0) / iters
        audio_s = lanes * scan_blocks * prog.ctx.block_frames / prog.ctx.sample_rate
        RES[key + "_step_ms"] = round(dt * 1e3, 1)
        RES[key + "_x_rt"] = round(audio_s / dt, 1)
        save()
        print(key, RES[key + "_step_ms"], "ms =", RES[key + "_x_rt"], "x rt",
              flush=True)

    # headline candidate first (the number the round is scored on)
    measure(16, 8)
    # lane scaling: how flat is wall time in lanes?
    measure(1, 8)
    measure(8, 8)
    # deeper scan: amortize RTT + host further
    measure(16, 16)
    print(json.dumps(RES, indent=1), flush=True)


if __name__ == "__main__":
    main()
