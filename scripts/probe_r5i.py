"""Decompose the DelayEffect block cost: read vs SVF vs DC vs saturation
vs the scan shell, by stubbing each piece (solo delay on 4 sources)."""
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

from phonic_tpu.ops import chrono as ch
from phonic_tpu.ops import filters as fl
from phonic_tpu.effects import delay as dmod


def build():
    from phonic_tpu import (EngineConfig, FilePlaybackOptions, FileSource,
                            Mixer, RenderProgram, AudioFileBuffer)
    from phonic_tpu.effects.delay import DelayEffect
    rng = np.random.default_rng(0)
    m = Mixer("main")
    for i in range(4):
        t = np.arange(48000) / 48000
        f = float(rng.uniform(100, 500))
        x = (0.5 * np.sin(2 * np.pi * f * t) * np.exp(-t * 2.0)).astype(np.float32)
        m.add_source(FileSource(AudioFileBuffer.from_array(x[None, :], 48000),
                                FilePlaybackOptions(volume=0.4, repeat=None)))
    m.add_effect(DelayEffect(delay_ms=300.0, feedback=0.4, wet=0.3,
                             max_delay_capacity_ms=1000.0))
    return RenderProgram(m, EngineConfig(sample_rate=48000,
                                         block_frames=131072))


def measure(tag):
    prog = build()
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
    print(json.dumps({f"delay_{tag}_ms": round(ms, 2),
                      f"delay_{tag}_compile_s": round(cs, 1)}), flush=True)


REAL = dict(read_g=ch.read_frac_win_grouped, read_w=ch.read_frac_win,
            tpt=fl.tpt_process, dc=fl.dc_process, roll=ch.roll)

for tag in sys.argv[1:] or ["full", "noread", "nosvf", "nodc", "noroll",
                            "plainread"]:
    try:
        if tag == "noread":
            ch.read_frac_win_grouped = lambda w, o, s: jnp.zeros(
                (w.shape[0], jnp.asarray(o).shape[-1]), jnp.float32)
        elif tag == "plainread":
            ch.read_frac_win_grouped = lambda w, o, s: ch.read_frac_win(w, o)
        elif tag == "nosvf":
            fl.tpt_process = lambda st, x, c, axis=-1, dtype=jnp.float32: (st, x)
        elif tag == "nodc":
            fl.dc_process = lambda st, x, r, axis=-1, dtype=jnp.float32: (st, x)
        elif tag == "noroll":
            ch.roll = lambda w, x: w
        measure(tag)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({tag + "_error": repr(e)[:300]}), flush=True)
    finally:
        ch.read_frac_win_grouped = REAL["read_g"]
        fl.tpt_process = REAL["tpt"]
        fl.dc_process = REAL["dc"]
        ch.roll = REAL["roll"]
        dmod.chrono_ops.read_frac_win_grouped = REAL["read_g"]
        dmod.filters.tpt_process = REAL["tpt"]
        dmod.filters.dc_process = REAL["dc"]
        dmod.chrono_ops.roll = REAL["roll"]
