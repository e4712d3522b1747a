"""Benchmark: audio-seconds rendered per second per chip at 48 kHz stereo.

Runs the five BASELINE.json configs on the default JAX backend (the real
TPU under the driver) and prints ONE JSON line for the headline metric:
the 16-source mixer graph with full effect chains (BASELINE config 3),
rendered as a BATCH of 8 independent lanes — the engine's intended
deployment shape (throughput over latency; each lane is a full independent
graph instance).  Per-config results (incl. single-lane numbers) go to
bench_results.json and stderr.

vs_baseline is the ratio against the BASELINE north star of 1000x real time
per chip (the reference publishes no numbers; its implicit target is 1x
real time on a desktop CPU).
"""

import json
import sys
import time

import numpy as np


def _mk_config(block_frames):
    from phonic_tpu import EngineConfig
    return EngineConfig(sample_rate=48000, block_frames=block_frames)


def _tone(frames=48000, freq=220.0, sr=48000, decay=2.0):
    from phonic_tpu import AudioFileBuffer
    t = np.arange(frames) / sr
    x = (0.5 * np.sin(2 * np.pi * freq * t) * np.exp(-t * decay)).astype(np.float32)
    return AudioFileBuffer.from_array(x[None, :], sr)


def config_play_file():
    """1: single WAV -> gain+pan+resample -> offline render."""
    from phonic_tpu import FilePlaybackOptions, FileSource, Mixer, RenderProgram
    m = Mixer("main")
    m.add_source(FileSource(_tone(sr=48000), FilePlaybackOptions(
        volume=0.8, panning=0.2, speed=1.09, repeat=None)))
    return RenderProgram(m, _mk_config(262144))


def config_sampler_64():
    """2: 64-voice Sampler with AHDSR envelopes."""
    from phonic_tpu import AhdsrConfig, Mixer, RenderProgram, Sampler
    from phonic_tpu.generators.base import GeneratorPlaybackOptions
    m = Mixer("main")
    s = Sampler(_tone(), GeneratorPlaybackOptions(voices=64),
                envelope=AhdsrConfig(attack=0.01, decay=0.3, sustain=0.6,
                                     release=0.4))
    rng = np.random.default_rng(0)
    for k in range(64):
        t = int(k * 480)
        nid = s.note_on(int(rng.integers(36, 84)), float(rng.uniform(0.4, 1.0)),
                        time=t)
        s.note_off(nid, time=t + 400000)  # held across the bench window
    m.add_source(s)
    return RenderProgram(m, _mk_config(131072))


def config_mixer_graph():
    """3 (headline): 16 file sources -> 4 sub-mixers with EQ5+chorus+reverb."""
    from phonic_tpu import FilePlaybackOptions, FileSource, Mixer, RenderProgram
    from phonic_tpu.effects.eq5 import Eq5Effect
    from phonic_tpu.effects.chorus import ChorusEffect
    from phonic_tpu.effects.reverb import ReverbEffect
    from phonic_tpu.effects.gain import GainEffect
    rng = np.random.default_rng(0)
    main = Mixer("main")
    subs = [main.add_mixer(Mixer(f"sub{i}")) for i in range(4)]
    for i in range(16):
        buf = _tone(frames=12000 + 977 * i, freq=float(rng.uniform(80, 660)))
        subs[i % 4].add_source(FileSource(buf, FilePlaybackOptions(
            volume=float(rng.uniform(0.2, 0.6)),
            panning=float(rng.uniform(-0.8, 0.8)),
            speed=float(rng.uniform(0.5, 2.0)), repeat=None)))
    for s in subs:
        s.add_effect(Eq5Effect(gains=list(rng.uniform(-6, 6, 5))))
        s.add_effect(ChorusEffect(rate=float(rng.uniform(0.3, 2.0))))
    # room-size floor/ceiling hints (documented capacity API): this graph
    # never automates the room, so feedback sub-blocks double
    main.add_effect(ReverbEffect(room_size=0.6, wet=0.2,
                                 min_room_size=0.55))
    main.add_effect(GainEffect(gain=0.8))
    # 131072-frame blocks: scans and dispatch amortize (offline throughput
    # shape; the Player uses small blocks for control latency instead)
    return RenderProgram(main, _mk_config(131072))


def config_granular_1k():
    """4: ~1k concurrent grains with per-grain envelopes."""
    from phonic_tpu import GranularConfig, Mixer, RenderProgram, Sampler
    from phonic_tpu.generators.base import GeneratorPlaybackOptions
    m = Mixer("main")
    # 10 voices x 100-grain pools, sized/densified so pools stay full
    s = Sampler(_tone(frames=96000), GeneratorPlaybackOptions(voices=10)) \
        .with_granular_playback(GranularConfig(
            size_ms=1000.0, density_hz=100.0, position=0.3, variation=0.5,
            spray=0.3, pan_spread=0.8))
    for v in range(10):
        s.note_on(48 + v, volume=0.3, time=v * 37)
    m.add_source(s)
    return RenderProgram(m, _mk_config(131072))


def config_mastering():
    """5: mastering chain on stems: gate + compressor/limiter + delay +
    distortion."""
    from phonic_tpu import FilePlaybackOptions, FileSource, Mixer, RenderProgram
    from phonic_tpu.effects.gate import GateEffect
    from phonic_tpu.effects.compressor import CompressorEffect
    from phonic_tpu.effects.delay import DelayEffect
    from phonic_tpu.effects.distortion import DistortionEffect
    rng = np.random.default_rng(0)
    m = Mixer("main")
    for i in range(4):
        m.add_source(FileSource(_tone(freq=float(rng.uniform(100, 500))),
                                FilePlaybackOptions(volume=0.4, repeat=None)))
    m.add_effect(GateEffect(threshold=-40.0))
    m.add_effect(CompressorEffect(threshold=-12.0, ratio=4.0))
    # capacity hint: this chain never automates the delay above 1 s, so the
    # line (and its per-step read window) needn't cover the 4 s param max
    # hints (documented DelayEffect API): this chain never automates the
    # delay below 250 ms or above 1 s, so the line stays small and the
    # feedback sub-block large (fewer recurrence-scan steps)
    m.add_effect(DelayEffect(delay_ms=300.0, feedback=0.4, wet=0.3,
                             min_delay_ms=250.0,
                             max_delay_capacity_ms=1000.0))
    m.add_effect(DistortionEffect("Diode", drive=1.0, mix=0.3))
    m.add_effect(CompressorEffect.limiter())
    return RenderProgram(m, _mk_config(131072))


def config_player_rt():
    """3b: the SAME 16-source graph in the shape the Player actually runs
    live: 8192-frame blocks, per-mixer metering, auto-bypass ON, blocks
    pulled one at a time through Player.render_block (host bookkeeping,
    packed transfers and device sync included)."""
    from phonic_tpu import FilePlaybackOptions, Player, PlayerConfig
    from phonic_tpu.effects.eq5 import Eq5Effect
    from phonic_tpu.effects.chorus import ChorusEffect
    from phonic_tpu.effects.reverb import ReverbEffect
    from phonic_tpu.outputs.null import NullOutput
    rng = np.random.default_rng(0)
    player = Player(NullOutput(48000, 2), PlayerConfig(block_frames=8192))
    subs = [player.add_mixer() for _ in range(4)]
    for i in range(16):
        buf = _tone(frames=12000 + 977 * i, freq=float(rng.uniform(80, 660)))
        player.play_file(buf, FilePlaybackOptions(
            volume=float(rng.uniform(0.2, 0.6)),
            panning=float(rng.uniform(-0.8, 0.8)),
            speed=float(rng.uniform(0.5, 2.0)), repeat=None),
            mixer=subs[i % 4].mixer)
    for s in subs:
        s.add_effect(Eq5Effect(gains=list(rng.uniform(-6, 6, 5))))
        s.add_effect(ChorusEffect(rate=float(rng.uniform(0.3, 2.0))))
    player.add_effect(ReverbEffect(room_size=0.6, wet=0.2))
    return player


CONFIGS = {
    # headline first: if a harness-level time budget cuts the run short,
    # the metric that matters is already recorded (results are written
    # incrementally).  After it, configs run in MISSING-DATA priority:
    # granular/mastering/player_rt have the thinnest official records
    # (r4 starved them on compile budget), while play_file and sampler
    # have solid histories and can afford to be skipped.  Plain lane
    # sweeps and the scan8 x16 aggregate were dropped — wall time is
    # ~proportional to total work on this backend, so they repeat the x1
    # number while burning compile budget (docs/PERF.md round 5).
    "mixer_graph_16src": config_mixer_graph,
    "granular_1k": config_granular_1k,
    "mastering_chain": config_mastering,
    "player_rt_8192": config_player_rt,
    "play_file": config_play_file,
    "sampler_64v": config_sampler_64,
}

HEADLINE = "mixer_graph_16src"

# Whole-bench deadline (seconds).  The r3 driver run died at rc=124 with
# only one config recorded; per-config alarms alone cannot bound the sum.
# Configs that would start after the deadline are skipped (still recorded)
# and the final JSON line always prints.
TOTAL_BUDGET_S = float(__import__("os").environ.get(
    "PHONIC_BENCH_BUDGET_S", "540"))


def bench_program(prog, min_iters=10, min_secs=1.0, lanes=1):
    import jax
    if hasattr(prog, "render_block"):  # a live Player (realtime shape)
        prog.render_block()  # compile + warm
        n = prog.engine_config.block_frames
        # drive the production pump loop itself (Player.run): depth-1
        # pipelined dispatch, per-block host bookkeeping, output.write
        iters = 0
        t0 = time.perf_counter()
        while True:
            prog.run(duration_frames=8 * n)
            iters += 8
            if iters >= min_iters and time.perf_counter() - t0 > min_secs:
                break
        dt = time.perf_counter() - t0
        return iters * n / prog.engine_config.sample_rate / dt
    if lanes > 1:
        from phonic_tpu.parallel.mesh import BatchedRenderProgram
        b = BatchedRenderProgram(prog, lanes=lanes)
        state = b.init_states()
        inputs = b.block_inputs(0)
        step = b.step
    else:
        state = prog.init_state()
        inputs = prog.packed_block_inputs(0)
        step = prog.step_packed
    state, audio = step(state, inputs)
    jax.block_until_ready(audio)
    iters = 0
    t0 = time.perf_counter()
    while True:
        state, audio = step(state, inputs)
        iters += 1
        if iters >= min_iters and time.perf_counter() - t0 > min_secs:
            break
    jax.block_until_ready(audio)
    dt = time.perf_counter() - t0
    return lanes * iters * prog.ctx.block_frames / prog.ctx.sample_rate / dt


def bench_scan(prog, lanes, scan_blocks, min_iters=3, min_secs=1.0):
    """Scan-over-blocks offline shape: ONE dispatch renders scan_blocks
    blocks on every lane (BatchedRenderProgram.scan_step) — per-block
    dispatch and host bookkeeping amortize on-device."""
    import jax
    from phonic_tpu.parallel.mesh import BatchedRenderProgram
    b = BatchedRenderProgram(prog, lanes=lanes)
    states = b.init_states()
    stacked = b.stacked_inputs(scan_blocks)
    states, audio = b.scan_step(states, stacked)
    jax.block_until_ready(audio)
    iters = 0
    t0 = time.perf_counter()
    while True:
        states, audio = b.scan_step(states, stacked)
        iters += 1
        if iters >= min_iters and time.perf_counter() - t0 > min_secs:
            break
    jax.block_until_ready(audio)
    dt = time.perf_counter() - t0
    return (lanes * iters * scan_blocks * prog.ctx.block_frames
            / prog.ctx.sample_rate / dt)


class _Budget(Exception):
    pass


def _force_real_execution():
    """Flip the axon relay out of speculative mode BEFORE any timing.

    The relay's cassette speculator completes ``block_until_ready`` without
    real execution until the process performs its first device->host data
    read; timings taken in that mode are fake (a bf16 matmul 'measured'
    400x above v5e physical peak).  One tiny fetch makes every subsequent
    dispatch execute (and cost) for real.  See CLAUDE.md 'THE SPECULATOR'."""
    import jax
    import jax.numpy as jnp
    np.asarray(jax.jit(lambda: jnp.zeros(2))())


def main():
    import signal

    # persistent compile cache: keeps the driver's bench run warm.  The
    # cache lives INSIDE the repo because /tmp does not survive container
    # recycling between the builder session and the driver's bench run
    # (round 4's driver ran every shape cold and starved 3 configs).
    try:
        import os
        import jax
        cache = os.environ.get(
            "PHONIC_JAX_CACHE",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache"))
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    _force_real_execution()

    def alarm(*_):
        raise _Budget()

    signal.signal(signal.SIGALRM, alarm)
    t_start = time.perf_counter()
    results = {}

    def run_one(key, budget_s, fn):
        left = TOTAL_BUDGET_S - (time.perf_counter() - t_start)
        if left < 30.0:
            results[key] = "skipped: total budget"
            print(f"  {key}: SKIPPED (total budget)", file=sys.stderr)
        else:
            try:
                signal.alarm(int(min(budget_s, left)))
                rt = fn()
                results[key] = round(rt, 2)
                print(f"  {key}: {rt:.1f}x realtime", file=sys.stderr)
            except _Budget:
                results[key] = "skipped: time budget"
                print(f"  {key}: SKIPPED (budget)", file=sys.stderr)
            except Exception as e:  # config failure shouldn't kill the bench
                results[key] = f"error: {e}"
                print(f"  {key}: ERROR {e}", file=sys.stderr)
            finally:
                signal.alarm(0)
        # write incrementally so a harness-level timeout keeps partials
        with open("bench_results.json", "w") as f:
            json.dump(results, f, indent=1)

    # The scan8 x16-lane aggregate shape was dropped in round 5: wall time
    # on this backend is proportional to total work regardless of lane
    # batching or scan depth (probe_r5e: scan8 x1 = 131x, scan8 x4
    # aggregate = 182x vs plain single-lane 183x), so the shape repeated
    # the single-lane number while burning a 160-260 s compile budget.
    # per-config alarms: the headline gets a wide window (the first config
    # absorbs relay warmup, which can take minutes after a heavy session);
    # later configs are all cache-warm (~30-60 s compile + ~5 s measure on
    # a healthy relay), so a 120 s alarm bounds the damage a degraded
    # relay can do — every config still gets ATTEMPTED inside the total
    # budget and whichever complete are recorded incrementally.
    for name, make in CONFIGS.items():
        run_one(name, 420 if name == HEADLINE else 120,
                lambda make=make: bench_program(make()))

    value = results.get(HEADLINE)
    value = value if isinstance(value, (int, float)) else 0.0
    print(json.dumps({
        "metric": "audio_seconds_rendered_per_sec_per_chip",
        "value": value,
        "unit": "x_realtime_48kHz_stereo_16src_mixergraph",
        "vs_baseline": round(value / 1000.0, 4),
    }))


if __name__ == "__main__":
    main()
