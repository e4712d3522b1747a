"""Decode + parity checks on the reference's REAL audio assets.

The 6 WAVs in /root/reference/assets are the files the reference's examples
actually play (reference: examples/play-file.rs, play-sequence.rs).  Every
expected value below is ground truth obtained INDEPENDENTLY of phonic_tpu's
decoder: stdlib ``wave`` for the PCM files, and hand-parsed fmt/data/smpl
chunks (struct.unpack on the raw bytes) for the float32 files and loop
points — so a transcription error in io/wav.py cannot hide here
(reference smpl parsing: src/source/file/decoder.rs:27-43)."""

import struct
import wave
from pathlib import Path

import numpy as np
import pytest

from phonic_tpu import AudioFileBuffer, EngineConfig, Mixer, RenderProgram
from phonic_tpu.io.decoder import file_info
from phonic_tpu.sources.file import FilePlaybackOptions, FileSource

ASSETS = Path("/root/reference/assets")

pytestmark = pytest.mark.skipif(
    not ASSETS.is_dir(), reason="reference assets not mounted")

# ground truth: (channels, sample_rate, frames, half-open loop range or None)
EXPECTED = {
    "AKWF_saw.wav": (1, 44100, 600, (0, 600), "forward"),
    "YuaiLoop.wav": (2, 48000, 288000, None, None),
    "altijd synth bit.wav": (2, 44100, 380835, None, None),
    "bass.wav": (1, 44100, 44980, (25585, 44980), "forward"),
    "cowbell.wav": (1, 44100, 7375, None, None),
    "pad-ambient.wav": (2, 48000, 362835, (286619, 362835), "forward"),
}


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_asset_metadata(name):
    ch, sr, frames, loop, mode = EXPECTED[name]
    info = file_info(ASSETS / name)
    assert info.channels == ch
    assert info.sample_rate == sr
    assert info.frames == frames
    buf = AudioFileBuffer.from_file(ASSETS / name)
    assert buf.channels == ch and buf.sample_rate == sr and buf.frames == frames
    assert buf.loop_range == loop
    if mode is not None:
        assert buf.loop_mode == mode


@pytest.mark.parametrize("name", ["AKWF_saw.wav", "bass.wav", "cowbell.wav"])
def test_s16_decode_matches_stdlib_wave(name):
    buf = AudioFileBuffer.from_file(ASSETS / name)
    w = wave.open(str(ASSETS / name))
    raw = np.frombuffer(w.readframes(w.getnframes()), "<i2")
    expected = raw.reshape(-1, w.getnchannels()).T.astype(np.float32) / 32768.0
    np.testing.assert_array_equal(buf.data[:, :-1], expected)


@pytest.mark.parametrize("name", ["altijd synth bit.wav", "pad-ambient.wav"])
def test_f32_decode_matches_raw_bytes(name):
    raw = (ASSETS / name).read_bytes()
    pos = 12
    audio = None
    while pos + 8 <= len(raw):
        cid = raw[pos:pos + 4]
        size, = struct.unpack_from("<I", raw, pos + 4)
        if cid == b"data":
            audio = np.frombuffer(raw[pos + 8:pos + 8 + size], "<f4")
        pos += 8 + size + (size & 1)
    expected = audio.reshape(-1, 2).T
    buf = AudioFileBuffer.from_file(ASSETS / name)
    np.testing.assert_array_equal(buf.data[:, :-1], expected)


def test_yuailoop_s24_decode():
    """24-bit PCM: independent bit-twiddling oracle on the raw data chunk."""
    raw = (ASSETS / "YuaiLoop.wav").read_bytes()
    pos = 12
    audio = None
    while pos + 8 <= len(raw):
        cid = raw[pos:pos + 4]
        size, = struct.unpack_from("<I", raw, pos + 4)
        if cid == b"data":
            audio = np.frombuffer(raw[pos + 8:pos + 8 + size], np.uint8)
        pos += 8 + size + (size & 1)
    b = audio.reshape(-1, 3).astype(np.uint32)
    vals = (b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)).astype(np.int64)
    vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
    expected = (vals.astype(np.float32) / float(1 << 23)).reshape(-1, 2).T
    buf = AudioFileBuffer.from_file(ASSETS / "YuaiLoop.wav")
    np.testing.assert_allclose(buf.data[:, :-1], expected, atol=1e-7)


# play_file-shaped renders: full decode -> resample -> gain/pan stack at
# 48 kHz stereo.  The committed whole-render RMS/peak fingerprints are
# regression armor over the real-world decode+render stack.


def _render_asset(name, frames=65536):
    buf = AudioFileBuffer.from_file(ASSETS / name)
    cfg = EngineConfig(sample_rate=48000, channels=2, block_frames=8192,
                      max_events_per_block=8)
    main = Mixer("main")
    main.add_source(FileSource(buf, FilePlaybackOptions(
        volume=0.8, fade_out_secs=0.0)))
    prog = RenderProgram(main, cfg)
    return prog.render(duration_frames=frames)


@pytest.mark.parametrize("name,expected_rms,expected_peak", [
    ("cowbell.wav", 0.051532, 0.797448),
    ("bass.wav", 0.115616, 0.796975),
    ("AKWF_saw.wav", 0.039145, 0.788941),
    ("pad-ambient.wav", 0.046874, 0.143298),
])
def test_asset_render_fingerprint(name, expected_rms, expected_peak):
    out = _render_asset(name)
    assert np.isfinite(out).all()
    rms = float(np.sqrt(np.mean(np.square(out))))
    peak = float(np.max(np.abs(out)))
    assert rms == pytest.approx(expected_rms, abs=2e-4), f"{name} rms {rms}"
    assert peak == pytest.approx(expected_peak, abs=2e-4), f"{name} peak {peak}"
