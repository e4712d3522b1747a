"""FLAC codec round-trips (reference decodes FLAC via symphonia,
Cargo.toml:46-56; here: phonic_tpu/io/flac.py implements the bitstream).

The fixture-grade encoder emits each subframe/stereo coding the decoder
supports, so every decode path is exercised without binary fixtures.
"""

import numpy as np
import pytest

from phonic_tpu.errors import MediaFileError
from phonic_tpu.io.decoder import AudioFileBuffer, decode_file
from phonic_tpu.io.flac import read_flac, write_flac

SR = 44100


def q16(x):
    return np.round(np.clip(x, -1.0, 1.0 - 1 / 32768) * 32768.0) / 32768.0


def smooth_stereo(frames=10000):
    t = np.arange(frames) / SR
    l = 0.5 * np.sin(2 * np.pi * 220.0 * t)
    r = 0.4 * np.sin(2 * np.pi * 330.0 * t + 0.5)
    return q16(np.stack([l, r]).astype(np.float32))


@pytest.mark.parametrize("kind", ["verbatim", "fixed2", "lpc2"])
def test_roundtrip_subframe_kinds(tmp_path, kind):
    x = smooth_stereo()
    p = tmp_path / f"{kind}.flac"
    write_flac(p, x, SR, subframe=kind)
    y, sr = read_flac(p)
    assert sr == SR and y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=1e-7)


@pytest.mark.parametrize("stereo", ["left_side", "right_side", "mid_side"])
def test_roundtrip_stereo_decorrelation(tmp_path, stereo):
    x = smooth_stereo()
    p = tmp_path / f"{stereo}.flac"
    write_flac(p, x, SR, subframe="fixed2", stereo=stereo)
    y, sr = read_flac(p)
    np.testing.assert_allclose(y, x, atol=1e-7)


def test_roundtrip_constant_and_partial_frame(tmp_path):
    x = np.full((1, 5000), 0.25, np.float32)  # 4096 + 904-frame tail
    p = tmp_path / "const.flac"
    write_flac(p, x, SR, subframe="constant")
    y, sr = read_flac(p)
    assert y.shape == (1, 5000)
    np.testing.assert_allclose(y, q16(x), atol=1e-7)


def test_roundtrip_noisy_signal(tmp_path):
    rng = np.random.default_rng(7)
    x = q16(rng.standard_normal((2, 8192)).astype(np.float32) * 0.3)
    p = tmp_path / "noise.flac"
    write_flac(p, x, SR, subframe="fixed2")
    y, _ = read_flac(p)
    np.testing.assert_allclose(y, x, atol=1e-7)


def test_audio_file_buffer_loads_flac(tmp_path):
    x = smooth_stereo(3000)
    p = tmp_path / "buf.flac"
    write_flac(p, x, SR)
    buf = AudioFileBuffer.from_file(p)
    assert buf.sample_rate == SR and buf.frames == 3000
    np.testing.assert_allclose(np.asarray(buf.data)[:, :-1], x, atol=1e-7)
    # sniffing works regardless of extension
    p2 = tmp_path / "renamed.bin"
    p2.write_bytes(p.read_bytes())
    data, info = decode_file(p2)
    assert info.sample_rate == SR


def test_corrupt_flac_raises(tmp_path):
    p = tmp_path / "bad.flac"
    x = smooth_stereo(3000)
    write_flac(p, x, SR)
    raw = bytearray(p.read_bytes())
    raw[60:70] = b"\xff" * 10  # stomp the first frame header region
    p.write_bytes(bytes(raw))
    with pytest.raises(MediaFileError):
        read_flac(p)


def test_native_decoder_matches_python():
    """native/flacdec.cpp must decode bit-identically to the Python spec
    (both full-file and the streaming cursor), or be absent (fallback)."""
    import unittest.mock as um

    from phonic_tpu.io import flac as flac_mod

    if flac_mod._native_lib() is None:
        pytest.skip("native IO lib unavailable on this host")
    rng = np.random.default_rng(11)
    x = np.cumsum(rng.integers(-300, 300, size=(2, 50000)), axis=1)
    x = (x / np.abs(x).max() * 0.8).astype(np.float32)
    path = "/tmp/flac_native_eq.flac"
    write_flac(path, x, 44100)
    a, ra = flac_mod.read_flac(path)
    with um.patch.object(flac_mod, "_native_lib", lambda: None):
        b, rb = flac_mod.read_flac(path)
    assert ra == rb
    np.testing.assert_array_equal(a, b)

    s = flac_mod.FlacStream(path)
    got = s.read_at(12345, 4096)
    s.close()
    with um.patch.object(flac_mod, "_native_lib", lambda: None):
        s2 = flac_mod.FlacStream(path)
        want = s2.read_at(12345, 4096)
        s2.close()
    np.testing.assert_array_equal(got, want)


def test_streaminfo_unknown_total(tmp_path):
    """STREAMINFO total_samples=0 is legal ("unknown", streaming encoders):
    FlacStream must discover the true length with a forward pass instead of
    rendering silence (regression: read_at's `decoded < total` loop never
    decoded a frame when total was 0)."""
    from phonic_tpu.io.flac import FlacStream

    x = smooth_stereo(20000)
    path = str(tmp_path / "unknown_total.flac")
    write_flac(path, x, SR)
    raw = bytearray(open(path, "rb").read())
    # STREAMINFO: 4 (magic) + 4 (block hdr) + 13 bytes, then the 36-bit
    # total spans the low 4 bits of byte 21 and bytes 22..25
    raw[21] &= 0xF0
    raw[22:26] = b"\x00\x00\x00\x00"
    path2 = str(tmp_path / "zeroed_total.flac")
    open(path2, "wb").write(bytes(raw))

    s = FlacStream(path2)
    assert s.total_frames == 20000
    got = s.read_at(5000, 4096)
    s.close()

    ref, rsr = read_flac(path)
    assert rsr == SR
    np.testing.assert_array_equal(got, ref[:, 5000:9096])

    # the chunked/streamed path sees the discovered length too
    from phonic_tpu.io.chunked import open_chunked
    r = open_chunked(path2)
    assert r.frames == 20000
    np.testing.assert_array_equal(r.read(5000, 4096), ref[:, 5000:9096])
    r.close()
