"""Streamed file source: host-fed windows must match preloaded playback."""

import numpy as np

from phonic_tpu import (AudioFileBuffer, EngineConfig, FilePlaybackOptions,
                        FileSource, Mixer, RenderProgram)
from phonic_tpu.sources.streamed import StreamedFileSource

SR = 48000


def buf(frames=40000, sr=44100):
    t = np.arange(frames) / sr
    x = (0.5 * np.sin(2 * np.pi * 330 * t) * np.exp(-t)).astype(np.float32)
    return AudioFileBuffer.from_array(x[None, :], sr)


def render(src, frames, block=2048):
    m = Mixer("main")
    m.add_source(src)
    return RenderProgram(m, EngineConfig(sample_rate=SR, block_frames=block)).render(
        duration_frames=frames)


def test_streamed_matches_preloaded():
    b = buf()
    opts = FilePlaybackOptions(volume=0.8, panning=0.3, speed=1.2,
                               fade_out_secs=0.0)
    pre = render(FileSource(b, opts), 32768)
    stm = render(StreamedFileSource(b, opts), 32768)
    # the streamed source's host-side f64 position slightly out-precisions
    # the preloaded source's compensated f32 position (~1e-3 frames @ 30 k)
    np.testing.assert_allclose(stm, pre, atol=1e-4)


def test_streamed_speed_events_match_preloaded():
    b = buf()
    def make(cls):
        src = cls(b, FilePlaybackOptions(fade_out_secs=0.0))
        m = Mixer("main")
        m.add_source(src)
        prog = RenderProgram(m, EngineConfig(sample_rate=SR, block_frames=2048))
        prog.set_parameter(src, "SPED", 1.5, at_frame=6000)
        prog.set_parameter(src, "SPED", 0.7, at_frame=15000)
        return prog.render(duration_frames=24576)
    pre = make(FileSource)
    stm = make(StreamedFileSource)
    np.testing.assert_allclose(stm, pre, atol=1e-4)


def test_streamed_loop_and_stop():
    x = np.linspace(0, 1, 2000, dtype=np.float32)
    b = AudioFileBuffer.from_array(x[None, :], SR, loop_range=(500, 1500))
    opts = FilePlaybackOptions(repeat=None, fade_out_secs=0.0)
    m = Mixer("main")
    src = StreamedFileSource(b, opts)
    m.add_source(src)
    prog = RenderProgram(m, EngineConfig(sample_rate=SR, block_frames=1024))
    prog.stop_source(src, at_frame=8000)
    out = prog.render(duration_frames=10240)
    # looping: period 1000 after entering the loop
    np.testing.assert_allclose(out[0, 2000:3000], out[0, 3000:4000], atol=1e-5)
    assert np.abs(out[:, 8001:]).max() == 0.0
