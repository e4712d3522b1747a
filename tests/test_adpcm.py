"""IMA + MS ADPCM WAV decode (reference: symphonia-codec-adpcm via
Cargo.toml:46-56).  Fixtures are built by in-test encoders that embed the
standard decoder state machine, so the decode must reconstruct them
EXACTLY; closeness to the original signal bounds quantization noise."""

import struct

import numpy as np

from phonic_tpu.io.wav import (
    _IMA_INDEX_TABLE, _IMA_STEP_TABLE, _MS_ADAPT_TABLE, _MS_COEFS,
    read_wav, read_wav_info,
)

SR = 22050


def _wav_container(fmt_chunk: bytes, data: bytes, fact_frames: int) -> bytes:
    chunks = b"".join([
        b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk,
        b"fact" + struct.pack("<II", 4, fact_frames),
        b"data" + struct.pack("<I", len(data)) + data,
    ])
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _encode_ima(x: np.ndarray, sr: int, spb: int = 505) -> bytes:
    """x: int16 [ch, frames].  Standard IMA quantizer + decoder-mirror."""
    ch, frames = x.shape
    block_align = 4 * ch + (spb - 1) // 8 * 4 * ch
    blocks = []
    # seed the step index to roughly the signal slope so the 4-bit
    # quantizer tracks from sample 1 (real encoders optimize this per block)
    index = [56] * ch
    pos = 0
    while pos < frames:
        block = bytearray()
        n = min(spb, frames - pos)
        pred = [int(x[c, pos]) for c in range(ch)]
        for c in range(ch):
            block += struct.pack("<hBB", pred[c], index[c], 0)
        nibbles = [[] for _ in range(ch)]
        for i in range(1, spb):
            for c in range(ch):
                s = int(x[c, pos + i]) if pos + i < frames else pred[c]
                step = int(_IMA_STEP_TABLE[index[c]])
                diff = s - pred[c]
                code = 0
                if diff < 0:
                    code = 8
                    diff = -diff
                if diff >= step:
                    code |= 4
                    diff -= step
                if diff >= step >> 1:
                    code |= 2
                    diff -= step >> 1
                if diff >= step >> 2:
                    code |= 1
                # decoder-mirror update
                d = (step >> 3)
                if code & 4: d += step
                if code & 2: d += step >> 1
                if code & 1: d += step >> 2
                pred[c] = max(min(pred[c] + (-d if code & 8 else d), 32767),
                              -32768)
                index[c] = max(min(index[c] + int(_IMA_INDEX_TABLE[code]), 88), 0)
                nibbles[c].append(code)
        # pack: per 8-sample group, 4 bytes per channel interleaved
        for g in range(len(nibbles[0]) // 8):
            for c in range(ch):
                grp = nibbles[c][g * 8:(g + 1) * 8]
                for k in range(4):
                    block.append(grp[2 * k] | (grp[2 * k + 1] << 4))
        assert len(block) == block_align
        blocks.append(bytes(block))
        pos += spb
    fmt = struct.pack("<HHIIHHHH", 0x0011, ch, sr,
                      sr * block_align // spb, block_align, 4, 2, spb)
    return _wav_container(fmt, b"".join(blocks), frames)


def _encode_ms(x: np.ndarray, sr: int, spb: int = 500) -> bytes:
    """x: int16 [ch, frames], predictor 0, standard adaptation."""
    ch, frames = x.shape
    block_align = 7 * ch + (spb - 2) * ch // 2
    c1, c2 = int(_MS_COEFS[0, 0]), int(_MS_COEFS[0, 1])
    blocks = []
    pos = 0
    while pos + 2 <= frames:
        block = bytearray()
        s2 = [int(x[c, pos]) for c in range(ch)]
        s1 = [int(x[c, pos + 1]) if pos + 1 < frames else 0 for c in range(ch)]
        idelta = [256] * ch
        for c in range(ch):
            block.append(0)  # predictor index
        for c in range(ch):
            block += struct.pack("<h", idelta[c])
        for c in range(ch):
            block += struct.pack("<h", s1[c])
        for c in range(ch):
            block += struct.pack("<h", s2[c])
        codes = []
        for i in range(2, spb):
            for c in range(ch):
                s = int(x[c, pos + i]) if pos + i < frames else s1[c]
                predicted = (s1[c] * c1 + s2[c] * c2) >> 8
                err = s - predicted
                code = max(min(int(round(err / idelta[c])), 7), -8)
                new = max(min(predicted + code * idelta[c], 32767), -32768)
                s2[c] = s1[c]
                s1[c] = new
                idelta[c] = max((int(_MS_ADAPT_TABLE[code & 0xF]) * idelta[c]) >> 8, 16)
                codes.append(code & 0xF)
        for k in range(0, len(codes), 2):
            block.append((codes[k] << 4) | codes[k + 1])
        assert len(block) == block_align, (len(block), block_align)
        blocks.append(bytes(block))
        pos += spb
    fmt = struct.pack("<HHIIHHHH", 0x0002, ch, sr,
                      sr * block_align // spb, block_align, 4, 32, spb)
    # MS ADPCM fmt also carries coef pairs; decoders (incl. ours) use the
    # standard table, so omitting them from cbSize payload is tolerated
    return _wav_container(fmt, b"".join(blocks), frames)


def _sine(frames, freq, sr, ch=2):
    t = np.arange(frames) / sr
    x = np.stack([0.6 * np.sin(2 * np.pi * freq * t),
                  0.3 * np.sin(2 * np.pi * freq * 1.5 * t)][:ch])
    return (x * 32767).astype(np.int16)


def test_ima_adpcm_roundtrip(tmp_path):
    x = _sine(SR // 2, 440.0, SR)
    p = tmp_path / "ima.wav"
    p.write_bytes(_encode_ima(x, SR))
    info = read_wav_info(p)
    assert info.format_tag == 0x0011 and info.channels == 2
    assert info.sample_rate == SR and abs(info.frames - SR // 2) <= 0
    data, info2 = read_wav(p)
    assert data.shape == (2, SR // 2)
    want = x.astype(np.float32) / 32768.0
    err = np.abs(data - want)
    # 4-bit ADPCM quantization noise: ~ -40 dB for a slow sine
    assert err.max() < 0.05, err.max()
    rms = float(np.sqrt(np.mean((data - want) ** 2)))
    assert rms < 0.01, rms


def test_ima_adpcm_mono(tmp_path):
    x = _sine(SR // 4, 220.0, SR, ch=1)
    p = tmp_path / "ima_mono.wav"
    p.write_bytes(_encode_ima(x, SR))
    data, info = read_wav(p)
    assert data.shape[0] == 1 and info.channels == 1
    want = x.astype(np.float32) / 32768.0
    assert np.abs(data - want).max() < 0.05


def test_ms_adpcm_roundtrip(tmp_path):
    x = _sine(SR // 2, 330.0, SR)
    p = tmp_path / "ms.wav"
    p.write_bytes(_encode_ms(x, SR))
    info = read_wav_info(p)
    assert info.format_tag == 0x0002 and info.channels == 2
    data, _ = read_wav(p)
    assert data.shape[0] == 2
    n = min(data.shape[1], x.shape[1])
    want = x.astype(np.float32)[:, :n] / 32768.0
    err = np.abs(data[:, :n] - want)
    assert err.max() < 0.05, err.max()


def test_adpcm_through_audio_file_buffer(tmp_path):
    from phonic_tpu import AudioFileBuffer

    x = _sine(SR // 4, 440.0, SR)
    p = tmp_path / "ima2.wav"
    p.write_bytes(_encode_ima(x, SR))
    buf = AudioFileBuffer.from_file(p)
    assert buf.sample_rate == SR and buf.channels == 2
    assert abs(buf.frames - SR // 4) <= 8
