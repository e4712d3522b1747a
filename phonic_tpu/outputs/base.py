"""Output device protocol.

Behavioural spec: reference src/output.rs — `OutputDevice` with
channel_count / sample_rate / sample_position / volume / pause / resume /
play / stop / close; `DefaultOutputDevice` selected by availability
(reference picks CPAL, WAV or Web by feature flags, src/output.rs:23-27).

Devices consume blocks produced by the Player's render pump; the audio
"callback" direction is inverted relative to the reference (the device
*receives* rendered blocks instead of pulling inside an OS callback) because
block rendering happens on the accelerator — the native bridge
(outputs/rt.py + native/) restores pull semantics at the hardware edge with
a lock-free ring buffer.
"""

from __future__ import annotations

import abc


class OutputDevice(abc.ABC):
    @property
    @abc.abstractmethod
    def sample_rate(self) -> int: ...

    @property
    @abc.abstractmethod
    def channel_count(self) -> int: ...

    @property
    @abc.abstractmethod
    def sample_position(self) -> int:
        """Frames actually emitted so far (reference: src/output.rs:44)."""

    @abc.abstractmethod
    def write(self, block) -> None:
        """Accept one planar float32 [channels, frames] block (may bloc
        until the device has room)."""

    def pause(self) -> None:
        pass

    def resume(self) -> None:
        pass

    @abc.abstractmethod
    def close(self) -> None: ...


def default_output_device(sample_rate: int = 48000, channels: int = 2,
                          path=None) -> OutputDevice:
    """DefaultOutputDevice analog: the realtime native device when its
    backend is available, else WAV (when a path is given), else null."""
    from .rt import RtOutput, rt_available
    if rt_available():
        return RtOutput(sample_rate, channels)
    if path is not None:
        from .wav_out import WavOutput
        return WavOutput(path, sample_rate, channels)
    from .null import NullOutput
    return NullOutput(sample_rate, channels)
