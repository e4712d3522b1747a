"""Shared example plumbing (reference: examples/common/arguments.rs) —
every example takes `-o out.wav` to render offline instead of playing on
the realtime device, making any scenario a deterministic fixture."""

import argparse

import numpy as np

from phonic_tpu.io.decoder import AudioFileBuffer
from phonic_tpu.outputs import NullOutput, WavOutput, RtOutput, rt_available
from phonic_tpu.player import Player, PlayerConfig


def make_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("-o", "--output", default=None,
                   help="render offline to this WAV file instead of playing")
    p.add_argument("--sample-rate", type=int, default=48000)
    p.add_argument("--block", type=int, default=8192)
    return p


def make_player(args) -> Player:
    if args.output:
        out = WavOutput(args.output, args.sample_rate, 2)
    elif rt_available():
        out = RtOutput(args.sample_rate, 2)
    else:
        out = NullOutput(args.sample_rate, 2, realtime=True)
    return Player(out, PlayerConfig(block_frames=args.block))


def demo_buffer(sr=48000, freq=220.0, secs=1.0, decay=3.0) -> AudioFileBuffer:
    """Synthetic test tone (examples ship no binary assets)."""
    t = np.arange(int(sr * secs)) / sr
    x = 0.5 * np.sin(2 * np.pi * freq * t) * np.exp(-t * decay)
    x += 0.2 * np.sin(2 * np.pi * freq * 2.01 * t) * np.exp(-t * decay * 1.5)
    return AudioFileBuffer.from_array(x.astype(np.float32)[None, :], sr)


def default_asset(name="bass.wav", sr=48000, secs=1.0):
    """A real-world asset when the reference checkout is mounted (the same
    files the reference examples play), else the synthetic tone."""
    import os
    path = os.path.join("/root/reference/assets", name)
    return path if os.path.exists(path) else demo_buffer(sr, secs=secs)
