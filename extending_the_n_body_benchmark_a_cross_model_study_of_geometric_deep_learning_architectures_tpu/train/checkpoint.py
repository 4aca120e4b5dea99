"""Checkpoint save/restore for params + optimizer + schedule state.

Stores the full training state (model params, optax state, epoch counter,
best metrics) like the reference checkpoint dict (``trainer.py:599-612``),
as a pickle of host numpy pytrees — exact-restore without needing an
abstract-template round-trip, robust across optax versions in this repo.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict

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
) -> str:
    os.makedirs(path, exist_ok=True)
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


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)
