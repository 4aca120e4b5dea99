"""Checkpoint save/restore for params + optimizer + schedule state.

Stores the full training state (model params, optax state, epoch counter,
best metrics) like the reference checkpoint dict (``trainer.py:599-612``).

Two backends:

* ``pickle`` (default) — host numpy pytrees in one file; exact-restore
  without an abstract-template round-trip, robust across optax versions.
* ``orbax`` — ``orbax.checkpoint`` directory format: the TPU-idiomatic
  choice for large sharded states (tensorstore-backed, per-array files,
  works with multi-host ``jax.sharding`` layouts).  Restore takes an
  ``item`` template (the live ``(params, opt_state)`` pytrees) so optax
  namedtuple structure is rebuilt exactly.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), tree)


def save_checkpoint(
    path: str,
    params,
    opt_state,
    step_count: int,
    best_metrics: Dict[str, Any] | None = None,
    filename: str = "model.ckpt",
    backend: str = "pickle",
) -> str:
    os.makedirs(path, exist_ok=True)
    if backend == "orbax":
        return _save_orbax(
            path, params, opt_state, step_count, best_metrics, filename=filename
        )
    payload = {
        "params": _to_host(params),
        "opt_state": _to_host(opt_state),
        "step_count": int(step_count),
        "best_metrics": dict(best_metrics or {}),
    }
    full = os.path.join(path, filename)
    tmp = full + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, full)
    return full


def load_checkpoint(path: str, template: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Load either backend; ``path`` is the ``model.ckpt`` file (pickle) or
    the ``model.orbax`` directory.  ``template`` = live
    ``{"params": ..., "opt_state": ...}`` pytrees, required to rebuild optax
    namedtuple structure from an orbax directory."""
    if os.path.isdir(path):
        return _load_orbax(path, template)
    with open(path, "rb") as f:
        return pickle.load(f)


# ------------------------------------------------------------------ orbax

def _save_orbax(
    path, params, opt_state, step_count, best_metrics, filename="model.ckpt"
) -> str:
    import json

    import orbax.checkpoint as ocp

    base = filename[: -len(".ckpt")] if filename.endswith(".ckpt") else filename
    full = os.path.abspath(os.path.join(path, base + ".orbax"))
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(
            full,
            {"params": _to_host(params), "opt_state": _to_host(opt_state)},
            force=True,
        )
    # scalar bookkeeping lives beside the tensorstore arrays (its pytree
    # shape varies run-to-run, so it can't be part of the restore template)
    with open(os.path.join(full, "meta.json"), "w") as f:
        json.dump(
            {"step_count": int(step_count), "best_metrics": dict(best_metrics or {})},
            f,
        )
    return full


def _load_orbax(path: str, template: Optional[Dict[str, Any]]) -> Dict[str, Any]:
    import json

    import orbax.checkpoint as ocp

    item = None
    if template is not None:
        item = {"params": template["params"], "opt_state": template["opt_state"]}
    with ocp.PyTreeCheckpointer() as ckptr:
        raw = ckptr.restore(os.path.abspath(path), item=item)
    meta = {"step_count": 0, "best_metrics": {}}
    meta_path = os.path.join(path, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return {
        "params": raw["params"],
        "opt_state": raw["opt_state"],
        "step_count": int(meta["step_count"]),
        "best_metrics": dict(meta.get("best_metrics") or {}),
    }
