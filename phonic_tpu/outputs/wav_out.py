"""Offline WAV output device.

Behavioural spec: reference src/output/wav.rs — pulls the root source in
blocks and writes 32-bit-float WAV, finalizing when the source exhausts or
the configured duration elapses.  Here blocks are *pushed* by the Player's
render pump; `finalize()` writes the file.
"""

from __future__ import annotations

import numpy as np

from ..io.wav import write_wav
from .base import OutputDevice


class WavOutput(OutputDevice):
    def __init__(self, path, sample_rate: int = 48000, channels: int = 2,
                 bits: int = 32, float_format: bool = True):
        self.path = path
        self._sr = sample_rate
        self._ch = channels
        self._bits = bits
        self._float = float_format
        self._chunks: list[np.ndarray] = []
        self._pos = 0
        self._closed = False

    @property
    def sample_rate(self) -> int:
        return self._sr

    @property
    def channel_count(self) -> int:
        return self._ch

    @property
    def sample_position(self) -> int:
        return self._pos

    def write(self, block) -> None:
        block = np.asarray(block, np.float32)
        self._chunks.append(block)
        self._pos += block.shape[-1]

    def audio(self) -> np.ndarray:
        if not self._chunks:
            return np.zeros((self._ch, 0), np.float32)
        return np.concatenate(self._chunks, axis=-1)

    def close(self) -> None:
        if not self._closed:
            write_wav(self.path, self.audio(), self._sr, bits=self._bits,
                      float_format=self._float)
            self._closed = True
