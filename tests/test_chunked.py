"""Incremental (chunked) decode: every chunked reader must produce the
same samples as the full decoder, with bounded resident decode memory.

Behavioural spec: reference src/source/file/streamed.rs:522-567 (decoder
thread + 128 Ki-sample ring -> O(ring) host memory for arbitrarily long
files); here io/chunked.py's bounded-LRU chunk cache plays that role."""

import struct
import sys
from pathlib import Path

import numpy as np
import pytest

from phonic_tpu.io.chunked import (BufferReader, CachedReader, open_chunked)
from phonic_tpu.io.decoder import decode_file
from phonic_tpu.io.wav import write_wav
from phonic_tpu.io.flac import write_flac

sys.path.insert(0, str(Path(__file__).parent))

SR = 22050


def sig(frames, ch=2, sr=SR):
    t = np.arange(frames) / sr
    x = np.stack([(0.5 * np.sin(2 * np.pi * 220 * t)),
                  (0.3 * np.sin(2 * np.pi * 331 * t))][:ch]).astype(np.float32)
    return x


def assert_reader_matches_full(path, atol=0.0):
    full, info = decode_file(path)
    r = open_chunked(path, chunk_frames=1024, max_chunks=4)
    assert r.sample_rate == info.sample_rate
    assert r.channels == info.channels
    assert abs(r.frames - info.frames) <= 1, (r.frames, info.frames)
    n = min(r.frames, info.frames)
    # forward chunked sweep in odd-sized steps (crosses chunk boundaries)
    got = np.concatenate([r.read(s, min(777, n - s))
                          for s in range(0, n, 777)], axis=1)
    np.testing.assert_allclose(got, full[:, :n], atol=atol)
    # random access across the whole file (exercises LRU eviction +
    # backward jumps)
    rng = np.random.default_rng(7)
    for _ in range(8):
        s = int(rng.integers(0, max(n - 500, 1)))
        np.testing.assert_allclose(r.read(s, 500), full[:, s:s + 500],
                                   atol=atol)
    # bounded memory no matter the access pattern
    assert r.resident_frames <= 1024 * 4
    # zero-pad outside the valid range
    assert np.all(r.read(-10, 5) == 0.0)
    assert np.all(r.read(n, 16)[:, 1:] == 0.0)
    r.close()
    return full


@pytest.mark.parametrize("bits,float_format", [(16, False), (24, False),
                                               (32, True)])
def test_wav_chunked(tmp_path, bits, float_format):
    path = tmp_path / "t.wav"
    write_wav(path, sig(20011), SR, bits=bits, float_format=float_format)
    assert_reader_matches_full(path)


def test_aiff_chunked(tmp_path):
    # build a minimal AIFF (16-bit BE) by hand
    x = (sig(9973, ch=1) * 32767).astype(">i2")
    frames = x.shape[1]
    body = x.T.tobytes()
    comm = struct.pack(">hIh", 1, frames, 16) + _f80(SR)
    ssnd = struct.pack(">II", 0, 0) + body
    chunks = (b"COMM" + struct.pack(">I", len(comm)) + comm
              + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd)
    raw = b"FORM" + struct.pack(">I", 4 + len(chunks)) + b"AIFF" + chunks
    path = tmp_path / "t.aiff"
    path.write_bytes(raw)
    assert_reader_matches_full(path)


def _f80(v):
    import math
    if v == 0:
        return b"\x00" * 10
    exp = math.floor(math.log2(v))
    mant = int(v / 2.0 ** (exp - 63))
    return struct.pack(">H", exp + 16383) + mant.to_bytes(8, "big")


def test_flac_chunked(tmp_path):
    path = tmp_path / "t.flac"
    write_flac(path, sig(15013), SR)
    assert_reader_matches_full(path)


def test_alac_chunked(tmp_path):
    """m4a/ALAC random access through the MP4 sample tables (each packet
    decodes independently) — was a hole: open_chunked used to reject m4a
    outright, so StreamedFileSource could not play ALAC at all."""
    from phonic_tpu.io.alac import write_alac
    path = tmp_path / "t.m4a"
    write_alac(path, sig(17003), SR, mode="rice", order=4)
    assert_reader_matches_full(path)


def test_alac_streamed_source(tmp_path):
    from phonic_tpu import EngineConfig, FilePlaybackOptions, Mixer, RenderProgram
    from phonic_tpu.io.alac import write_alac
    from phonic_tpu.sources.streamed import StreamedFileSource
    x = sig(9000, sr=48000)
    path = tmp_path / "s.m4a"
    write_alac(path, x, 48000)
    m = Mixer("main")
    m.add_source(StreamedFileSource(str(path),
                                    FilePlaybackOptions(fade_out_secs=0.0),
                                    chunk_frames=2048, max_chunks=4))
    prog = RenderProgram(m, EngineConfig(sample_rate=48000, block_frames=1024))
    out = prog.render(duration_frames=9000)
    np.testing.assert_allclose(np.asarray(out), x[:, :9000], atol=2e-4)


def test_ima_adpcm_chunked(tmp_path):
    from test_adpcm import _encode_ima, _wav_container
    x = (sig(8000) * 32000).astype(np.int16)
    spb = 505
    ch = 2
    block_align = 4 * ch + (spb - 1) // 8 * 4 * ch
    fmt = struct.pack("<HHIIHH", 0x11, ch, SR,
                      SR * block_align // spb, block_align, 4) \
        + struct.pack("<HH", 2, spb)
    raw = _wav_container(fmt, _encode_ima(x, SR, spb), x.shape[1])
    path = tmp_path / "ima.wav"
    path.write_bytes(raw)
    assert_reader_matches_full(path)


def test_mp3_chunked(tmp_path):
    from phonic_tpu.io.mp3 import mp3_available
    if not mp3_available():
        pytest.skip("no libmpg123")
    from test_mp3_vorbis import _encode_mp3_sine
    path = tmp_path / "t.mp3"
    _encode_mp3_sine(path, secs=1.5, sr=44100)
    assert_reader_matches_full(path, atol=2e-5)


def test_vorbis_chunked():
    from phonic_tpu.io.vorbis import vorbis_available
    ogg = Path("/opt/venv/lib/python3.12/site-packages/pygame/examples/data/"
               "house_lo.ogg")
    if not vorbis_available() or not ogg.exists():
        pytest.skip("no libvorbisfile / no ogg fixture")
    assert_reader_matches_full(ogg, atol=2e-5)


def test_cached_gather_loop_fold():
    """gather() with loop-folded (non-monotonic) index windows: exact and
    chunk-bounded."""
    x = sig(50000)
    r = CachedReader(BufferReader(x, SR), chunk_frames=2048, max_chunks=3)
    idx = np.concatenate([np.arange(40000, 41000), np.arange(8000, 9000),
                          np.array([-5, 50000, 49999, 0])])
    out = r.gather(idx)
    np.testing.assert_array_equal(out[:, :1000], x[:, 40000:41000])
    np.testing.assert_array_equal(out[:, 1000:2000], x[:, 8000:9000])
    assert np.all(out[:, 2000] == 0) and np.all(out[:, 2001] == 0)
    np.testing.assert_array_equal(out[:, 2002], x[:, 49999])
    np.testing.assert_array_equal(out[:, 2003], x[:, 0])
    assert r.resident_frames <= 3 * 2048


def test_streamed_source_from_path_matches_buffer(tmp_path):
    """StreamedFileSource given a PATH (chunked decode) renders identically
    to the same source given the preloaded buffer."""
    import jax
    from phonic_tpu import (AudioFileBuffer, EngineConfig, FilePlaybackOptions,
                            Mixer, RenderProgram)
    from phonic_tpu.sources.streamed import StreamedFileSource

    frames = 30000
    x = sig(frames, ch=1, sr=44100)
    path = tmp_path / "t.wav"
    write_wav(path, x, 44100, bits=32, float_format=True)
    opts = FilePlaybackOptions(volume=0.8, speed=1.1, fade_out_secs=0.0,
                               loop_range=(4000, 12000), repeat=2)

    def render(src):
        m = Mixer("main")
        m.add_source(src)
        return RenderProgram(m, EngineConfig(
            sample_rate=48000, block_frames=2048)).render(duration_frames=24576)

    from_buf = render(StreamedFileSource(
        AudioFileBuffer.from_array(x, 44100), opts))
    src = StreamedFileSource(str(path), opts, chunk_frames=4096, max_chunks=4)
    from_path = render(src)
    np.testing.assert_array_equal(from_buf, from_path)
    assert src.reader.resident_frames <= 4096 * 4


@pytest.mark.slow
def test_streamed_long_file_bounded_memory(tmp_path):
    """Render from a WAV much bigger than the chunk cache with bounded
    resident decode memory (the 'arbitrarily long files' guarantee,
    streamed.rs:522-567).  The file is written in slices so the test itself
    stays O(chunk)."""
    from phonic_tpu import EngineConfig, FilePlaybackOptions, Mixer, RenderProgram
    from phonic_tpu.io.wav import wav_header
    from phonic_tpu.sources.streamed import StreamedFileSource

    sr = 48000
    frames = 40_000_000  # ~305 MB of float32 stereo
    path = tmp_path / "big.wav"
    with open(path, "wb") as f:
        f.write(wav_header(sr, 2, 32, True, frames * 2 * 4))
        chunk = 1 << 20
        t0 = 0
        while t0 < frames:
            n = min(chunk, frames - t0)
            t = (t0 + np.arange(n)) / sr
            x = (0.25 * np.sin(2 * np.pi * 110 * t)).astype(np.float32)
            f.write(np.repeat(x, 2).tobytes())
            t0 += n
    src = StreamedFileSource(str(path), FilePlaybackOptions(
        fade_out_secs=0.0), chunk_frames=65536, max_chunks=8)
    assert src.reader.frames == frames
    m = Mixer("main")
    m.add_source(src)
    prog = RenderProgram(m, EngineConfig(sample_rate=sr, block_frames=8192))
    # seek near the end: random access must not decode the whole file
    src.seek(0, 39_000_000.0)
    out = prog.render(duration_frames=65536, mode="loop")
    assert np.max(np.abs(out)) > 0.1
    assert src.reader.resident_frames <= 65536 * 8
    assert src.reader.decoded_chunk_fetches <= 32


def test_flac_seek_index_backward_jump():
    """Backward jumps rewind to the sparse seek index discovered during
    forward decode, not to byte 0 — and decode identically to a fresh
    cursor (symphonia seek-table analog)."""
    from phonic_tpu.io.flac import FlacStream, write_flac

    rng = np.random.default_rng(17)
    x = np.cumsum(rng.integers(-200, 200, size=(1, 400000)), axis=1)
    x = (x / np.abs(x).max() * 0.8).astype(np.float32)
    path = "/tmp/chunked_seekidx.flac"
    write_flac(path, x, 48000)
    s = FlacStream(path)
    s.read_at(390000, 2048)  # forward pass builds the index
    assert len(s._seek_index) >= 2
    s.seek_back(270000)
    assert s._decoded >= 262144  # landed on an index point, not byte 0
    got = s.read_at(270000, 2048)
    fresh = FlacStream(path)
    want = fresh.read_at(270000, 2048)
    np.testing.assert_array_equal(got, want)
    s.close()
    fresh.close()
