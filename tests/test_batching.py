"""Batched file-source lane banks must match the unbatched path exactly."""

import dataclasses

import numpy as np

from phonic_tpu import (AudioFileBuffer, EngineConfig, FilePlaybackOptions,
                        FileSource, Mixer, RenderProgram)

SR = 48000


def build(batch: bool, seed=0):
    rng = np.random.default_rng(seed)
    main = Mixer("main")
    subs = [main.add_mixer(Mixer(f"s{i}")) for i in range(2)]
    srcs = []
    for i in range(6):
        frames = 4000 + 700 * i
        t = np.arange(frames) / 44100
        x = (0.4 * np.sin(2 * np.pi * (100 + 60 * i) * t)).astype(np.float32)
        buf = AudioFileBuffer.from_array(x[None, :], 44100)
        src = FileSource(buf, FilePlaybackOptions(
            volume=float(rng.uniform(0.3, 0.9)),
            panning=float(rng.uniform(-0.8, 0.8)),
            speed=float(rng.uniform(0.6, 1.8)),
            start_time=int(rng.integers(0, 2000)),
            repeat=None,
        ), name=f"src{i}")
        subs[i % 2].add_source(src)
        srcs.append(src)
    cfg = EngineConfig(sample_rate=SR, block_frames=2048, batch_sources=batch)
    prog = RenderProgram(main, cfg)
    return prog, srcs


def test_batched_equals_unbatched():
    pa, sa = build(True)
    pb, sb = build(False)
    assert pa.file_batches, "expected at least one batch group"
    # schedule identical automation + stops on both
    for prog, srcs in ((pa, sa), (pb, sb)):
        prog.set_parameter(srcs[0], "VOLU", 0.2, at_frame=3000)
        prog.set_parameter(srcs[2], "SPED", 1.3, at_frame=5000)
        prog.set_parameter(srcs[4], "PANN", -1.0, at_frame=1000)
        prog.stop_source(srcs[1], at_frame=6000)
        prog.stop_source(srcs[3], at_frame=4000, kill=True)
        srcs[5].seek(4096, 1500.0)
    a = pa.render(duration_frames=12288)
    b = pb.render(duration_frames=12288)
    np.testing.assert_allclose(a, b, atol=2e-6)


def test_batched_loops_and_repeats():
    def make(batch):
        main = Mixer("main")
        for i in range(3):
            x = np.linspace(0, 1, 1000 + i * 100, dtype=np.float32)
            buf = AudioFileBuffer.from_array(
                x[None, :], SR, loop_range=(100, 800 + i * 50))
            main.add_source(FileSource(buf, FilePlaybackOptions(
                repeat=None, fade_out_secs=0.0), name=f"l{i}"))
        cfg = EngineConfig(sample_rate=SR, block_frames=1024, batch_sources=batch)
        return RenderProgram(main, cfg)
    a = make(True).render(duration_frames=8192)
    b = make(False).render(duration_frames=8192)
    np.testing.assert_allclose(a, b, atol=2e-6)
