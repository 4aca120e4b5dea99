"""Reload a trained run from its run-dir artifacts.

The reference reconstructs models for inference from the run dir's
``training_args.json`` + ``metadata.json`` + checkpoint
(``utils/nbody_utils.py:load_model_for_inference`` + ``get_dataset_metadata
_path``); this is the equivalent for our artifact layout.
"""

from __future__ import annotations

import json
import os
from types import SimpleNamespace
from typing import Optional, Tuple

from ..data.gravity_otf import GravityDatasetOtf
from ..models import create_model
from .checkpoint import load_checkpoint


def find_dataset_metadata(run_dir: str) -> Optional[dict]:
    for d in os.listdir(run_dir):
        p = os.path.join(run_dir, d, "metadata.json")
        if d.endswith("_dataset") and os.path.exists(p):
            with open(p) as f:
                return json.load(f)
    return None


def load_run(
    run_dir: str,
    checkpoint: str = "model.ckpt",
    n_bodies: Optional[int] = None,
    seed: Optional[int] = None,
) -> Tuple[object, dict, GravityDatasetOtf, SimpleNamespace]:
    """Returns ``(model, params, dataset, args)`` for a finished run dir.

    ``seed`` seeds the re-instantiated dataset's simulation rng so
    ground-truth draws are reproducible (metadata records no seed — without
    one the dataset seeds itself from SystemRandom)."""
    with open(os.path.join(run_dir, "training_args.json")) as f:
        args = SimpleNamespace(**json.load(f)["args"])
    model = create_model(args.model_type, **(args.model_kwargs or {}))
    ckpt = load_checkpoint(os.path.join(run_dir, checkpoint))
    params = ckpt["params"]
    metadata = find_dataset_metadata(run_dir) or {}
    if "partition" in metadata or "cutoff_rate" in metadata:
        # offline charged-systems run: its metadata has no gravity-sim
        # params, and from_metadata would silently fall back to default
        # gravity physics — rollout numbers against the wrong system
        raise ValueError(
            f"{run_dir} was trained on the offline dataset "
            f"({metadata.get('dataset_name')!r}); load_run can only rebuild "
            "on-the-fly gravity datasets for rollout evaluation (the offline "
            "dataset has no ground-truth trajectory generator — reference "
            "parity, PARITY.md)"
        )
    dataset = GravityDatasetOtf.from_metadata(
        metadata, n_bodies=n_bodies, cache_data=False, seed=seed
    )
    return model, params, dataset, args
