"""Dataloader layer — the reference's L2 API surface
(``dataloaders/base_dataloader.py`` + 8 per-model subclasses), dense-native.

In this framework featurization runs *inside* each model's jitted forward
(SURVEY.md §7 design stance), so a "dataloader" reduces to: own the dataset,
produce dense ``(Scene, y)`` batches, and build the model-appropriate
neighbour mask (``preprocess_batch``).  The registry mirrors the reference's
``DATALOADER_CONFIG_NAMES`` keys; per-model defaults (e.g. segnn/painn/
ponita use ``num_neighbors=4`` in ``config.yaml``) come from the config
section exactly as before.

API parity with ``BaseDataLoader`` (``base_dataloader.py:6-30``):
``get_batch() -> (Scene, y)``, ``preprocess_batch(scene) -> mask``,
``postprocess_batch(pred) -> pred``, ``get_num_nodes()``.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple, Type

import jax.numpy as jnp

from ..core import graph as G
from ..core.scene import Scene
from .gravity_otf import GravityDatasetOtf
from .offline_dataset import OfflineNBodyDataset


class NBodyDataLoader:
    """On-the-fly gravity dataloader (role of ``NBodyDataLoader`` +
    per-model subclasses — the model-specific featurization now lives in the
    model, so only the neighbour policy differs)."""

    def __init__(self, args, partition: str = "train"):
        self.args = args
        self.partition = partition
        self.dataset = self.create_dataset()
        n = self.dataset.num_nodes
        k = getattr(args, "num_neighbors", None)
        self.num_neighbors = k if (k and 0 < k < n) else n - 1

    def create_dataset(self) -> GravityDatasetOtf:
        a = self.args
        train = self.partition == "train"
        # A non-train partition must be an *independent* stream: it neither
        # reads nor writes the sim cache (a shared cache would replay the
        # training trajectories from index 0) and, when the run is
        # deterministically seeded, draws from a disjoint seeded stream.
        seed = getattr(a, "data_seed", None)
        if not train and seed is not None:
            seed = seed + 7919
        return GravityDatasetOtf(
            dataset_name=a.dataset_name,
            target=a.target,
            batch_size=a.batch_size,
            sim_length=getattr(a, "sim_length", 10000),
            sample_freq=a.sample_freq,
            noise_var=getattr(a, "noise_var", 0.0),
            num_nodes=a.num_atoms,
            vel_norm=getattr(a, "vel_norm", 1e-16),
            interaction_strength=getattr(a, "interaction_strength", 2.0),
            dt=getattr(a, "dt", 0.01),
            softening=getattr(a, "softening", 0.2),
            double_precision=getattr(a, "double_precision", False),
            center_of_mass=getattr(a, "center_of_mass", False),
            use_cached=train
            and getattr(a, "use_cached", True)
            and getattr(a, "model_path", None) is None,
            cache_data=train and getattr(a, "cache_data", True),
            seed=seed,
        )

    def get_batch(self) -> Tuple[Scene, jnp.ndarray]:
        return self.dataset.get_batch()

    def preprocess_batch(self, scene: Scene) -> jnp.ndarray:
        """Model-input graph topology (the reference's per-model
        ``preprocess_batch`` built edge_index + features here)."""
        return G.knn_mask(scene.pos, self.num_neighbors)

    def postprocess_batch(self, predictions):
        return predictions

    def get_num_nodes(self) -> int:
        return self.dataset.num_nodes

    def get_ground_truth_trajectories(self, batch_size: Optional[int] = None):
        return self.dataset.get_ground_truth_trajectories(batch_size)


class OfflineSegnnDataLoader:
    """Offline charged-systems loader (role of
    ``SegnnNbodyOfflineDataloader``)."""

    def __init__(self, args, partition: str = "train"):
        self.args = args
        self.dataset = OfflineNBodyDataset(
            dataset_name=args.dataset_name,
            data_dir=getattr(args, "data_directory", "datasets_offline/data"),
            partition=partition,
            max_samples=getattr(args, "max_samples", 10**8),
            frame_0=getattr(args, "frame_0", 30),
            frame_T=getattr(args, "frame_T", 40),
            cutoff_rate=getattr(args, "cutoff_rate", 0.0),
            target=args.target,
            batch_size=args.batch_size,
            # batch selection + test-split rotation augmentation follow the
            # run's data seed like the OTF loader above (not a fixed 0)
            seed=getattr(args, "data_seed", None) or 0,
        )

    def get_batch(self):
        scene, y, _mask = self.dataset.get_batch()
        return scene, y

    def preprocess_batch(self, scene: Scene) -> jnp.ndarray:
        # always derived from the scene passed in — a mask cached from the
        # most recent get_batch would silently mismatch any other scene's
        # geometry (validation batches, rollout frames)
        import numpy as _np

        return jnp.asarray(self.dataset.edge_mask(_np.asarray(scene.pos)))

    def postprocess_batch(self, predictions):
        return predictions

    def get_num_nodes(self) -> int:
        return self.dataset.num_nodes


DATALOADER_REGISTRY: Dict[str, Type] = {
    "egnn_mc_nbody": NBodyDataLoader,
    "painn_nbody": NBodyDataLoader,
    "segnn_nbody": NBodyDataLoader,
    "seconv_nbody": NBodyDataLoader,
    "ponita_nbody": NBodyDataLoader,
    "cgenn_nbody": NBodyDataLoader,
    "graph_transformer_nbody": NBodyDataLoader,
    "equiformer_v2_nbody": NBodyDataLoader,
    "gmn_nbody": NBodyDataLoader,
    "segnn_nbody_offline": OfflineSegnnDataLoader,
}


def create_dataloader(args, partition: str = "train"):
    """Registry factory (role of ``load_class_from_args`` +
    ``DATALOADER_CONFIG_NAMES``)."""
    name = getattr(args, "dataloader_type", None) or f"{args.model_type}_nbody"
    cls = DATALOADER_REGISTRY.get(name, NBodyDataLoader)
    return cls(args, partition=partition)
