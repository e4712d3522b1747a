"""Round-5: lane scaling sweep (scan8 x lanes), scan8 single-lane, and the
realtime player pump incl. control->audible latency."""
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


def scan_case(lanes, blocks=8):
    t0 = time.perf_counter()
    rt = bench.bench_scan(bench.config_mixer_graph(), lanes=lanes,
                          scan_blocks=blocks)
    print(json.dumps({f"scan{blocks}_x{lanes}_x_rt": round(rt, 1),
                      "compile_s": round(time.perf_counter() - t0, 1)}),
          flush=True)


def player_case():
    t0 = time.perf_counter()
    player = bench.config_player_rt()
    rt = bench.bench_program(player)
    compile_s = time.perf_counter() - t0
    # control->audible latency: set a parameter, render until it can be
    # audible; latency = wall time of one render_block (the pump's
    # dispatch+materialize) + one block of audio buffering
    lat = []
    for _ in range(10):
        t0 = time.perf_counter()
        player.render_block()
        lat.append(time.perf_counter() - t0)
    blk_ms = 1000.0 * float(np.median(lat))
    n = player.engine_config.block_frames
    sr = player.engine_config.sample_rate
    print(json.dumps({
        "player_rt_x_rt": round(rt, 2),
        "player_block_wall_ms": round(blk_ms, 1),
        "player_block_audio_ms": round(1000.0 * n / sr, 1),
        "control_to_audible_ms": round(blk_ms + 1000.0 * n / sr, 1),
        "compile_s": round(compile_s, 1)}), flush=True)


for arg in sys.argv[1:] or ["player", "scan1", "scan4", "scan16"]:
    try:
        if arg == "player":
            player_case()
        else:
            scan_case(int(arg[4:]))
    except Exception as e:  # noqa: BLE001
        print(json.dumps({arg + "_error": repr(e)[:300]}), flush=True)
