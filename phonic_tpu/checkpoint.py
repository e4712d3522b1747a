"""Render-state checkpoint/resume.

The reference has no checkpointing (nearest analogs are seek + effect Reset
messages); explicit DSP state pytrees make it trivial here: snapshot a
RenderProgram's state mid-render, store it, resume later — bit-identical
continuation of filters, delays, reverb tails, voice positions and
smoothers.
"""

from __future__ import annotations

import pickle

import numpy as np
import jax


def save_state(state, path=None):
    """Snapshot a render state pytree to host numpy (and optionally disk)."""
    host = jax.tree.map(lambda x: np.asarray(x), state)
    if path is not None:
        with open(path, "wb") as f:
            pickle.dump(host, f)
    return host


def load_state(path_or_tree):
    """Load a snapshot back (device placement happens lazily on next use)."""
    if isinstance(path_or_tree, (str, bytes)) or hasattr(path_or_tree, "__fspath__"):
        with open(path_or_tree, "rb") as f:
            return pickle.load(f)
    return path_or_tree
