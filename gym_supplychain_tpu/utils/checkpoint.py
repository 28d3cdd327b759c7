"""Checkpoint / resume for training runs (SURVEY.md §5: absent upstream).

The full training state — policy params, optimizer state, env-state pytree
(stocks, pipeline, episode tables, clock) and PRNG keys — is one flat pytree,
so exact resume is a single save/restore.  Uses orbax when available, with a
plain-numpy .npz fallback so the core package has no hard dependency.
"""
from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import numpy as np

__all__ = ["save_checkpoint", "restore_checkpoint"]


def save_checkpoint(path: str, state: Any, step: int = 0) -> str:
    """Save a pytree checkpoint; returns the written path."""
    os.makedirs(path, exist_ok=True)
    try:
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        target = os.path.join(path, f"step_{step}")
        ckptr.save(target, jax.device_get(state), force=True)
        return target
    except Exception:
        target = os.path.join(path, f"step_{step}.pkl")
        flat, treedef = jax.tree.flatten(jax.device_get(state))
        with open(target, "wb") as fh:
            pickle.dump({"leaves": [np.asarray(x) for x in flat],
                         "treedef": treedef, "step": step}, fh)
        return target


def restore_checkpoint(path: str, like: Any = None) -> Any:
    """Restore a checkpoint written by ``save_checkpoint``.

    ``path`` may be a ``step_N``(.pkl) target or the checkpoint directory
    itself, in which case the highest-numbered step is restored.
    ``like`` (an example pytree) guides structure/dtype restoration for the
    orbax path; the pickle fallback restores exactly what was saved.
    """
    base = os.path.basename(path.rstrip("/"))
    if os.path.isdir(path) and not base.startswith("step_"):
        steps = [e for e in os.listdir(path) if e.startswith("step_")]
        if not steps:
            raise FileNotFoundError(f"no step_* checkpoints under {path}")
        latest = max(steps,
                     key=lambda e: int(e[len("step_"):].split(".")[0]))
        path = os.path.join(path, latest)
    if path.endswith(".pkl"):
        with open(path, "rb") as fh:
            blob = pickle.load(fh)
        return jax.tree.unflatten(blob["treedef"], blob["leaves"])
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    if like is not None:
        return ckptr.restore(path, item=jax.device_get(like))
    return ckptr.restore(path)
