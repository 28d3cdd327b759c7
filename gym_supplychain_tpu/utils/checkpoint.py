"""Checkpoint / resume for training runs (SURVEY.md §5: absent upstream).

The full training state — policy params, optimizer state, env-state pytree
(stocks, pipeline, episode tables, clock) and PRNG keys — is one flat pytree,
so exact resume is a single save/restore.  Uses orbax when available, with a
plain-pickle fallback so the core package has no hard dependency.

Format (self-describing, identical shape in both backends):
    {"format": "gst-ckpt-v2", "step": N, "state": <pytree>}
The pickle backend stores the pytree verbatim (NamedTuples round-trip);
orbax serializes NamedTuples as dicts, so a template (``like=``) restores
the original classes and, in multi-process runs, the original shardings.

Multi-host: saving a globally-sharded state first replicates each
non-addressable array over its own mesh (an all-gather emitted by XLA), so
every process holds the full value; process 0 writes, all processes
barrier.  Restoring with ``like=`` re-applies each leaf's sharding via
``jax.device_put``, so a 2-process run resumes bitwise-identically
(tests/test_multihost.py).
"""
from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec

__all__ = ["save_checkpoint", "restore_checkpoint"]

FORMAT = "gst-ckpt-v2"


def _fetch_full(state: Any) -> Any:
    """Device→host fetch that works for globally-sharded (multi-process)
    arrays: non-addressable leaves are replicated over their mesh first."""
    def fetch(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            repl = NamedSharding(x.sharding.mesh, PartitionSpec())
            x = jax.jit(lambda a: a, out_shardings=repl)(x)
        return np.asarray(jax.device_get(x))
    return jax.tree.map(fetch, state)


def _reshard_like(state: Any, like: Any) -> Any:
    """Re-apply ``like``'s per-leaf shardings/dtypes to host-restored data."""
    def put(x, l):
        if isinstance(l, jax.Array):
            x = np.asarray(x).astype(l.dtype)
            return jax.device_put(x, l.sharding)
        return x
    return jax.tree.map(put, state, like)


def save_checkpoint(path: str, state: Any, step: int = 0) -> str:
    """Save a pytree checkpoint; returns the written path.

    Safe under multi-process JAX: call from ALL processes (collective)."""
    multiproc = jax.process_count() > 1
    payload = {"format": FORMAT, "step": step, "state": _fetch_full(state)}
    os.makedirs(path, exist_ok=True)
    if not multiproc:
        try:
            import orbax.checkpoint as ocp
            target = os.path.join(path, f"step_{step}")
            ocp.PyTreeCheckpointer().save(target, payload, force=True)
            return target
        except Exception:
            pass
    # pickle backend: single-writer (process 0), no cross-process barriers
    # of its own (orbax's internal syncs assume it is called collectively)
    target = os.path.join(path, f"step_{step}.pkl")
    if jax.process_index() == 0:
        tmp = target + ".tmp"
        with open(tmp, "wb") as fh:
            pickle.dump(payload, fh)
        os.replace(tmp, target)
    if multiproc:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("gst_ckpt_save")
    return target


def restore_checkpoint(path: str, like: Any = None) -> Any:
    """Restore the state pytree written by ``save_checkpoint``.

    ``path`` may be a ``step_N``(.pkl) target or the checkpoint directory
    itself, in which case the highest-numbered step is restored.  ``like``
    (an example pytree, e.g. the freshly-initialized TrainState) restores
    the exact container classes, dtypes and shardings; without it the orbax
    backend returns plain nested dicts (self-describing: top-level keys are
    the TrainState fields — ``params``, ``opt_state``, ``env``, ``key``).
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
            payload = pickle.load(fh)
    else:
        import orbax.checkpoint as ocp
        item = None if like is None else {"format": FORMAT, "step": 0,
                                          "state": jax.device_get(like)}
        payload = ocp.PyTreeCheckpointer().restore(path, item=item)
    if not (isinstance(payload, dict) and payload.get("format") == FORMAT):
        raise ValueError(f"{path} is not a {FORMAT} checkpoint")
    state = payload["state"]
    if like is not None:
        state = _reshard_like(state, like)
    return state
