"""The dense scene struct that replaces PyG ``Data``/``Batch`` graphs.

The reference passes sparse edge-indexed PyG graphs between dataloaders and
models (``dataloaders/n_body_dataloader.py:44-67`` builds a ``Batch`` of
``batch_size`` disconnected 5-node graphs).  On TPU we keep everything dense:
a batch of B independent simulations with N bodies each is a set of
``[B, N, ...]`` arrays, and the graph topology is a ``[B, N, N]`` boolean
neighbour mask.  Every scatter/gather in the reference becomes a masked
reduction over the ``j`` axis — which XLA maps straight onto the MXU/VPU.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Scene:
    """A batch of independent N-body systems.

    Attributes:
      pos:   ``[B, N, 3]`` positions.
      vel:   ``[B, N, 3]`` velocities.
      force: ``[B, N, 3]`` forces at the current frame (may be zeros during
             rollout — the reference also assumes force
             is not predicted, ``helper_scripts/infer_self_feed.py:189-191``).
      mass:  ``[B, N, 1]`` masses (all ones for the gravity dataset,
             ``synthetic_sim.py:372``).
      charge: optional ``[B, N, 1]`` charges (offline charged dataset).
    """

    pos: jnp.ndarray
    vel: jnp.ndarray
    force: jnp.ndarray
    mass: jnp.ndarray
    charge: Optional[jnp.ndarray] = None

    @property
    def batch_size(self) -> int:
        return self.pos.shape[0]

    @property
    def num_bodies(self) -> int:
        return self.pos.shape[1]

    @property
    def dtype(self):
        return self.pos.dtype

    @classmethod
    def stationary(cls, batch_size: int, num_bodies: int, dtype=jnp.float32) -> "Scene":
        """All-zero scene with unit masses — handy for shape/compile checks."""
        z = jnp.zeros((batch_size, num_bodies, 3), dtype=dtype)
        m = jnp.ones((batch_size, num_bodies, 1), dtype=dtype)
        return cls(pos=z, vel=z, force=z, mass=m)

    def astype(self, dtype) -> "Scene":
        return Scene(
            pos=self.pos.astype(dtype),
            vel=self.vel.astype(dtype),
            force=self.force.astype(dtype),
            mass=self.mass.astype(dtype),
            charge=None if self.charge is None else self.charge.astype(dtype),
        )
