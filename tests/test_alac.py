"""ALAC (m4a) decode: round-trips through the fixture-grade encoder cover
every decoder path — verbatim escape frames, adaptive Golomb/Rice entropy
(history, escapes, zero runs), order-0 / order-31 / adaptive-LPC
prediction, SCE+CPE elements, partial last frames, and the MP4 sample
tables (reference: the `alac` crate in Cargo.toml:46-56; decode parity is
lossless so round-trips must be EXACT)."""

import numpy as np
import pytest

from phonic_tpu.io.alac import read_alac, write_alac
from phonic_tpu.io.decoder import AudioFileBuffer, decode_file, file_info

SR = 44100


def sig(frames=10000, ch=2, kind="tone"):
    t = np.arange(frames) / SR
    if kind == "tone":
        x = np.stack([0.5 * np.sin(2 * np.pi * 220 * t),
                      0.3 * np.sin(2 * np.pi * 331 * t)][:ch])
    elif kind == "noise":
        rng = np.random.default_rng(3)
        x = rng.uniform(-0.9, 0.9, (ch, frames))
    else:  # sparse: long silent runs exercise the zero-run escape path
        x = np.zeros((ch, frames))
        x[:, 1000:1100] = 0.7
        x[:, 5000:5010] = -0.5
    return x.astype(np.float32)


def quantized(x):
    return np.clip(np.round(x * 32767.0), -32768, 32767) / 32768.0


@pytest.mark.parametrize("mode,order", [
    ("verbatim", 0), ("rice", 0), ("order31", 0), ("rice", 4), ("rice", 8),
])
@pytest.mark.parametrize("kind", ["tone", "noise", "sparse"])
def test_roundtrip_stereo(tmp_path, mode, order, kind):
    x = sig(kind=kind)
    path = tmp_path / "t.m4a"
    write_alac(path, x, SR, mode=mode, order=order)
    got, sr = read_alac(path)
    assert sr == SR
    expected = np.round(np.clip(x, -1, 1) * 32767.0) / 32768.0
    np.testing.assert_allclose(got, expected, atol=1e-7)


def test_roundtrip_mono_partial_frame(tmp_path):
    # 4096*2 + 777: exercises the has_size partial last packet + SCE
    x = sig(frames=4096 * 2 + 777, ch=1)
    path = tmp_path / "m.m4a"
    write_alac(path, x, SR, mode="rice")
    got, sr = read_alac(path)
    assert got.shape == (1, 4096 * 2 + 777)
    expected = np.round(np.clip(x, -1, 1) * 32767.0) / 32768.0
    np.testing.assert_allclose(got, expected, atol=1e-7)


def test_decode_file_dispatch(tmp_path):
    """m4a goes through the decoder front-end by sniffing (ftyp box),
    whatever the file extension."""
    x = sig(frames=5000)
    path = tmp_path / "renamed.bin"
    write_alac(path, x, SR)
    data, info = decode_file(path)
    assert info.sample_rate == SR and info.channels == 2
    assert data.shape == (2, 5000)
    buf = AudioFileBuffer.from_file(path)
    assert buf.frames == 5000
    fi = file_info(path)
    assert fi.frames == 5000 and fi.channels == 2


def test_through_file_source(tmp_path):
    """An ALAC file plays through the normal FileSource render path."""
    from phonic_tpu import (EngineConfig, FilePlaybackOptions, FileSource,
                            Mixer, RenderProgram)
    x = sig(frames=20000)
    path = tmp_path / "t.m4a"
    write_alac(path, x, SR, mode="rice", order=4)
    buf = AudioFileBuffer.from_file(path)
    m = Mixer("main")
    m.add_source(FileSource(buf, FilePlaybackOptions(fade_out_secs=0.0)))
    out = RenderProgram(m, EngineConfig(
        sample_rate=SR, block_frames=2048)).render(duration_frames=8192)
    np.testing.assert_allclose(
        out[:, :8192], np.round(np.clip(x[:, :8192], -1, 1) * 32767.0) / 32768.0,
        atol=2e-4)


def test_native_decoder_matches_python():
    """native ph_alac_packet must decode bit-identically to the Python
    spec, over every encoder mode the fixture encoder emits."""
    import unittest.mock as um

    from phonic_tpu.io import alac as alac_mod

    if alac_mod._native_alac() is None:
        pytest.skip("native IO lib unavailable on this host")
    rng = np.random.default_rng(3)
    x = np.cumsum(rng.integers(-400, 400, size=(2, 30011)), axis=1)
    x = (x / np.abs(x).max() * 0.7).astype(np.float32)
    path = "/tmp/alac_native_eq.m4a"
    write_alac(path, x, 48000)
    a, ra = alac_mod.read_alac(path)
    with um.patch.object(alac_mod, "_native_alac", lambda: None):
        b, rb = alac_mod.read_alac(path)
    assert ra == rb
    np.testing.assert_array_equal(a, b)
