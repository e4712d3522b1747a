"""WebOutput: chunked WAV-over-HTTP streaming (reference analog of
src/output/web.rs — see outputs/web.py for the transport inversion)."""

import struct
import threading
import urllib.request

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from phonic_tpu.outputs.web import WebOutput

SR = 48000


def test_web_output_streams_valid_wav():
    out = WebOutput(SR, 2, port=0)
    try:
        # producer: push a known sine from a thread (like the render pump)
        t = np.arange(4096) / SR
        block = np.stack([np.sin(2 * np.pi * 440 * t),
                          0.5 * np.sin(2 * np.pi * 440 * t)]).astype(np.float32)

        stop = threading.Event()

        def pump():
            while not stop.is_set():
                out.write(block)

        th = threading.Thread(target=pump, daemon=True)
        th.start()

        req = urllib.request.urlopen(out.url + "stream.wav", timeout=10)
        hdr = req.read(44)
        assert hdr[:4] == b"RIFF" and hdr[8:12] == b"WAVE"
        fmt_tag, ch, rate = struct.unpack_from("<HHI", hdr, 20)
        assert (fmt_tag, ch, rate) == (3, 2, SR)  # float32 stereo
        body = b""
        while len(body) < 4 * 2 * 8192:
            body += req.read(65536)
        stop.set()
        req.close()
        x = np.frombuffer(body[: len(body) // 8 * 8], np.float32).reshape(-1, 2).T
        # the served audio is the pushed sine
        assert np.abs(x).max() > 0.9
        seg = x[0][1024:3072]
        spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
        f = np.argmax(spec) * SR / len(seg)
        assert abs(f - 440.0) < 30.0, f
        assert out.sample_position > 0
        th.join(timeout=5)
    finally:
        out.close()


def test_web_output_index_page_and_live_drop():
    out = WebOutput(SR, 2, port=0, queue_blocks=2)
    try:
        page = urllib.request.urlopen(out.url, timeout=10).read().decode()
        assert "stream.wav" in page
        # with no client the queue drops oldest instead of blocking the pump
        blk = np.zeros((2, 2048), np.float32)
        for _ in range(20):
            out.write(blk)  # must not deadlock
        assert out.client_count == 0
    finally:
        out.close()


def test_webaudio_page_and_raw_stream():
    """/webaudio serves the AudioWorklet client; /stream.f32 delivers the
    written blocks as raw interleaved float32 (web.rs:52-115 analog)."""
    import urllib.request

    from phonic_tpu.outputs.web import WebOutput

    out = WebOutput(sample_rate=8000, channels=2, queue_blocks=4)
    try:
        page = urllib.request.urlopen(out.url + "webaudio", timeout=5).read()
        assert b"AudioWorkletProcessor" in page
        assert b"registerProcessor('phonic-feeder'" in page
        assert b"8000" in page

        block = np.stack([np.linspace(-1, 1, 256, dtype=np.float32),
                          np.linspace(1, -1, 256, dtype=np.float32)])
        import threading

        def writer():
            for _ in range(4):
                out.write(block)

        t = threading.Thread(target=writer, daemon=True)
        t.start()
        req = urllib.request.urlopen(out.url + "stream.f32", timeout=5)
        raw = req.read(256 * 2 * 4)
        got = np.frombuffer(raw, np.float32).reshape(-1, 2).T
        np.testing.assert_array_equal(got, block)
        t.join(timeout=5)
    finally:
        out.close()
