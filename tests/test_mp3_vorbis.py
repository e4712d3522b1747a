"""MP3 + Ogg/Vorbis decode (reference: src/source/file/decoder.rs, which
delegates to symphonia; here ctypes bindings to the host's
libmpg123/libvorbisfile — see io/mp3.py for the rationale).

The MP3 fixture is generated in-test with the host's libmp3lame, so the
decode path is validated end-to-end against known signal content."""

import ctypes
import math
from pathlib import Path

import numpy as np
import pytest

from phonic_tpu.io.mp3 import mp3_available, read_mp3
from phonic_tpu.io.vorbis import read_vorbis, vorbis_available

PYGAME_DATA = Path("/opt/venv/lib/python3.12/site-packages/pygame/examples/data")
SR = 44100


def _encode_mp3_sine(path, freq=440.0, secs=1.0, sr=SR):
    """Encode a stereo sine with the host's LAME (skip tests if absent)."""
    try:
        lame = ctypes.CDLL("libmp3lame.so.0")
    except OSError:
        pytest.skip("no libmp3lame on this host to build the fixture")
    lame.lame_init.restype = ctypes.c_void_p
    h = lame.lame_init()
    lame.lame_set_in_samplerate(ctypes.c_void_p(h), sr)
    lame.lame_set_num_channels(ctypes.c_void_p(h), 2)
    lame.lame_set_brate(ctypes.c_void_p(h), 128)
    assert lame.lame_init_params(ctypes.c_void_p(h)) >= 0
    n = int(sr * secs)
    t = np.arange(n) / sr
    left = (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    right = (0.25 * np.sin(2 * np.pi * freq * 2 * t)).astype(np.float32)
    out = (ctypes.c_ubyte * (n * 2 + 7200))()
    lame.lame_encode_buffer_ieee_float.restype = ctypes.c_int
    lame.lame_encode_buffer_ieee_float.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int]
    written = lame.lame_encode_buffer_ieee_float(
        ctypes.c_void_p(h), left.ctypes.data, right.ctypes.data, n,
        out, len(out))
    assert written > 0, written
    data = bytes(out[:written])
    tail = lame.lame_encode_flush(ctypes.c_void_p(h), out, len(out))
    data += bytes(out[:max(tail, 0)])
    lame.lame_close(ctypes.c_void_p(h))
    Path(path).write_bytes(data)
    return left, right


needs_mp3 = pytest.mark.skipif(not mp3_available(), reason="no libmpg123")
needs_vorbis = pytest.mark.skipif(not vorbis_available(),
                                  reason="no libvorbisfile")


@needs_mp3
def test_mp3_roundtrip_sine(tmp_path):
    p = tmp_path / "tone.mp3"
    left, right = _encode_mp3_sine(p)
    data, sr = read_mp3(p)
    assert sr == SR and data.shape[0] == 2
    # codec adds encoder+decoder delay padding; length within ~4 granules
    assert abs(data.shape[1] - len(left)) < 5000
    # dominant frequency of each channel survives the lossy round trip
    for ch, f_want in ((0, 440.0), (1, 880.0)):
        seg = data[ch][SR // 4 : SR // 2]
        spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
        f_got = np.argmax(spec) * sr / len(seg)
        assert abs(f_got - f_want) < 5.0, (ch, f_got)
    # amplitudes within a lossy-codec tolerance
    rms_l = float(np.sqrt(np.mean(data[0][SR // 4 : SR // 2] ** 2)))
    assert abs(rms_l - 0.5 / math.sqrt(2)) < 0.02, rms_l


@needs_mp3
def test_mp3_through_file_source(tmp_path):
    """VERDICT r1 item 6 'done' criterion: play_file accepts an .mp3."""
    from phonic_tpu import (AudioFileBuffer, EngineConfig, FilePlaybackOptions,
                            FileSource, Mixer, RenderProgram)

    p = tmp_path / "tone.mp3"
    _encode_mp3_sine(p, secs=0.5)
    buf = AudioFileBuffer.from_file(p)
    assert buf.sample_rate == SR and buf.channels == 2
    m = Mixer("main")
    m.add_source(FileSource(buf, FilePlaybackOptions(volume=0.8,
                                                     fade_out_secs=0.0)))
    prog = RenderProgram(m, EngineConfig(sample_rate=48000, block_frames=4096))
    out = prog.render(duration_frames=24000)
    assert np.isfinite(out).all() and np.abs(out).max() > 0.2


@needs_mp3
def test_mp3_info_probe(tmp_path):
    from phonic_tpu.io.decoder import file_info

    p = tmp_path / "tone.mp3"
    _encode_mp3_sine(p, secs=0.25)
    info = file_info(p)
    assert info.sample_rate == SR and info.channels == 2
    assert abs(info.duration_secs - 0.25) < 0.1


@needs_vorbis
@pytest.mark.skipif(not (PYGAME_DATA / "house_lo.ogg").exists(),
                    reason="no ogg fixture on this host")
def test_vorbis_decode_fixture():
    data, sr = read_vorbis(PYGAME_DATA / "house_lo.ogg")
    assert sr == 11025 and data.shape[0] == 1
    assert 70000 < data.shape[1] < 90000
    rms = float(np.sqrt(np.mean(data ** 2)))
    assert 0.1 < rms < 0.4, rms
    assert np.isfinite(data).all()


@needs_mp3
@needs_vorbis
@pytest.mark.skipif(not (PYGAME_DATA / "house_lo.ogg").exists(),
                    reason="no fixtures on this host")
def test_mp3_and_vorbis_agree_on_same_song():
    """The same music in both formats must decode to the same signal up to
    the mp3 encoder delay (529+576=1105 samples) and lossy noise."""
    d, _ = read_mp3(PYGAME_DATA / "house_lo.mp3")
    o, _ = read_vorbis(PYGAME_DATA / "house_lo.ogg")
    n = 30000
    a = d[0][1200 + 1105 : 1200 + 1105 + n]
    b = o[0][1200 : 1200 + n]
    r = float(np.corrcoef(a, b)[0, 1])
    assert r > 0.99, r


@needs_vorbis
def test_vorbis_through_decode_file():
    if not (PYGAME_DATA / "house_lo.ogg").exists():
        pytest.skip("no ogg fixture")
    from phonic_tpu.io.decoder import decode_file

    data, info = decode_file(PYGAME_DATA / "house_lo.ogg")
    assert info.sample_rate == 11025 and data.shape[0] == 1
