"""Render-state checkpoint/resume.

The reference has no checkpointing (nearest analogs are seek + effect Reset
messages, src/effect/reverb.rs:470-494); explicit DSP state pytrees make it
natural here: snapshot a RenderProgram's state mid-render, store it, resume
later — bit-identical continuation of filters, delays, reverb tails, voice
positions and smoothers.

Snapshots embed a structural signature (pytree structure + per-leaf
shape/dtype + engine config) so resuming against a program whose topology
or configuration changed fails with a readable error instead of an opaque
tree-structure mismatch deep inside jit.

Resuming into a REBUILT program (not the one that made the snapshot)
requires deterministic node names: auto-named nodes get process-global
sequence numbers, so an unnamed graph rebuilt from scratch produces
different state paths and will (correctly) fail verification.
"""

from __future__ import annotations

import pickle

import numpy as np
import jax

from .errors import CheckpointError

_MAGIC = "phonic_tpu-checkpoint"
_VERSION = 1


def state_signature(state, config=None) -> dict:
    """Structural signature of a render-state pytree: enough to detect any
    topology/shape/dtype drift between snapshot and resume."""
    leaves, treedef = jax.tree.flatten(state)
    return {
        "treedef": str(treedef),
        "leaves": [(tuple(np.shape(x)), str(np.asarray(x).dtype))
                   for x in leaves],
        "config": repr(config) if config is not None else None,
    }


def _diff_signatures(saved: dict, current: dict) -> list[str]:
    problems = []
    if saved["treedef"] != current["treedef"]:
        problems.append(
            "state tree structure differs (graph topology changed since the "
            "snapshot; rebuild the same graph or carry state across edits "
            "with RenderProgram.adopt())")
    else:
        for i, (a, b) in enumerate(zip(saved["leaves"], current["leaves"])):
            if a != list(b) and tuple(a) != tuple(b):
                sa = (tuple(a[0]), a[1])
                sb = (tuple(b[0]), b[1])
                if sa != sb:
                    problems.append(
                        f"leaf {i}: snapshot {sa[0]}/{sa[1]} vs "
                        f"program {sb[0]}/{sb[1]}")
            if len(problems) >= 4:
                problems.append("...")
                break
    if (saved.get("config") and current.get("config")
            and saved["config"] != current["config"]):
        problems.append(f"engine config differs: snapshot "
                        f"{saved['config']} vs program {current['config']}")
    return problems


def save_state(state, path=None, program=None):
    """Snapshot a render state pytree to host numpy (and optionally disk).

    With ``program`` given, the snapshot embeds the program's config in its
    signature; :func:`load_state` then verifies shape, dtype, tree structure
    and config before handing the state back.
    """
    host = jax.tree.map(lambda x: np.asarray(x), state)
    if path is not None:
        snap = {
            "magic": _MAGIC,
            "version": _VERSION,
            "signature": state_signature(
                host, getattr(program, "config", None)),
            "state": host,
        }
        with open(path, "wb") as f:
            pickle.dump(snap, f)
    return host


def load_state(path_or_tree, program=None):
    """Load a snapshot back (device placement happens lazily on next use).

    With ``program`` given, raises :class:`CheckpointError` describing every
    structural mismatch (topology edits, block-size/config changes, dtype
    drift) instead of failing opaquely inside the jitted step.
    """
    if isinstance(path_or_tree, (str, bytes)) or hasattr(path_or_tree, "__fspath__"):
        with open(path_or_tree, "rb") as f:
            snap = pickle.load(f)
        if isinstance(snap, dict) and snap.get("magic") == _MAGIC:
            state = snap["state"]
            saved_sig = snap["signature"]
        else:  # pre-v1 raw pickle: no signature to verify
            state = snap
            saved_sig = None
    else:
        state = path_or_tree
        saved_sig = None

    if program is not None:
        current = state_signature(program.init_state(),
                                  getattr(program, "config", None))
        saved = saved_sig or state_signature(state, None)
        problems = _diff_signatures(saved, current)
        if problems:
            raise CheckpointError(
                "checkpoint does not match the program it is being resumed "
                "into:\n  - " + "\n  - ".join(problems))
    return state
