"""Planar buffer utilities: channel remapping, interleaving, level metrics.

Behavioural spec: reference src/utils/buffer.rs.  The reference stores audio
interleaved and SIMD-vectorises ops with `pulp` (:89-180); the engine's
native layout is planar ``[channels, frames]`` (XLA vectorises the frame
axis), interleaving only at I/O edges (see io/wav.py).
"""

from __future__ import annotations

import jax.numpy as jnp


def remap_channels(x, out_channels: int):
    """Channel-layout conversion (reference: src/utils/buffer.rs:183-266):
    mono->N duplicates into the first two channels, N->mono averages the
    first two, otherwise the first two channels are copied and extra output
    channels are zeroed."""
    x = jnp.asarray(x)
    in_ch = x.shape[0]
    n = x.shape[-1]
    if in_ch == out_channels:
        return x
    if in_ch == 1:
        dup = min(out_channels, 2)
        parts = [x[0]] * dup + [jnp.zeros_like(x[0])] * (out_channels - dup)
        return jnp.stack(parts)
    if out_channels == 1:
        return ((x[0] + x[1]) * 0.5)[None, :]
    pairs = [x[i] for i in range(min(in_ch, 2))]
    pairs += [jnp.zeros((n,), x.dtype)] * (out_channels - len(pairs))
    return jnp.stack(pairs[:out_channels])


def interleave(x):
    """[channels, frames] -> [frames * channels] interleaved."""
    return jnp.asarray(x).T.reshape(-1)


def deinterleave(x, channels: int):
    """[frames * channels] interleaved -> [channels, frames]."""
    return jnp.asarray(x).reshape(-1, channels).T


def peak_level(x, axis=-1):
    return jnp.max(jnp.abs(x), axis=axis)


def rms_level(x, axis=-1):
    return jnp.sqrt(jnp.mean(jnp.square(x), axis=axis))
