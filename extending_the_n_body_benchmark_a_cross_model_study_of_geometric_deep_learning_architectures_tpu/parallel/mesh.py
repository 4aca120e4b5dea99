"""Device mesh construction and sharding specs.

The reference has *no* distributed backend — a single CUDA device picked via
nvidia-smi (``utils/gpu_selector.py:51-99``; SURVEY.md §5.8).  The TPU-native
replacement is a first-class mesh layer:

* axis ``sim``  — the batch of independent simulations (the only semantic
  "data parallel" axis of the workload, SURVEY.md §2 parallelism item 1).
* axis ``body`` — optional sharding of the body dimension for large N; the
  dense ``[B, N, N]`` pairwise tensors partition over one N axis and XLA
  GSPMD inserts the ICI collectives (the N-body analogue of blockwise/ring
  attention, SURVEY.md §5.7).

Multi-host: call :func:`initialize_distributed` before mesh construction;
``jax.devices()`` then spans all hosts and the same code runs unchanged.
"""

from __future__ import annotations

import os
import warnings
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SIM_AXIS = "sim"
BODY_AXIS = "body"


def initialize_distributed(**kwargs) -> None:
    """Multi-host init (``jax.distributed.initialize``); no-op if the
    process is single-host or already initialized — but a *failed* init on
    a genuinely multi-host launch (bad coordinator address) must not be
    swallowed, or training silently proceeds on one host's chips."""
    def _env_gt1(name: str) -> bool:
        return os.environ.get(name, "").strip() not in ("", "0", "1")

    multi_host = (
        bool(kwargs.get("num_processes", 0) and int(kwargs["num_processes"]) > 1)
        # an explicit coordinator address is always multi-host intent
        or bool(kwargs.get("coordinator_address"))
        or bool(os.environ.get("JAX_COORDINATOR_ADDRESS"))
        # markers the standard launchers set for jax's auto-detection
        # (TPU pod / megascale, SLURM, Open MPI) — a failed init under any
        # of these must raise, not degrade to single-host training
        or bool(os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
        or _env_gt1("JAX_NUM_PROCESSES")
        or _env_gt1("SLURM_NTASKS")
        or _env_gt1("OMPI_COMM_WORLD_SIZE")
    )
    try:
        jax.distributed.initialize(**kwargs)
    except Exception as e:
        if multi_host:
            raise
        # single-host: "already initialized" / no coordinator is expected
        warnings.warn(f"jax.distributed.initialize skipped: {e!r}")


def make_mesh(
    n_devices: Optional[int] = None,
    body_parallel: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh of shape ``(sim, body)`` over the first ``n_devices`` devices."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        if len(devs) < n_devices:
            # silently truncating would build a smaller mesh than asked for
            # and hide the misconfiguration (e.g. jax already bound to a
            # 1-chip backend) — fail loudly instead
            raise ValueError(
                f"requested a {n_devices}-device mesh but only {len(devs)} "
                f"device(s) are visible ({jax.default_backend()} backend); "
                "bootstrap a virtual CPU backend with JAX_PLATFORMS=cpu and "
                f"XLA_FLAGS=--xla_force_host_platform_device_count={n_devices} "
                "before importing jax"
            )
        devs = devs[:n_devices]
    n = len(devs)
    if n % body_parallel != 0:
        raise ValueError(f"{n} devices not divisible by body_parallel={body_parallel}")
    arr = np.array(devs).reshape(n // body_parallel, body_parallel)
    return Mesh(arr, (SIM_AXIS, BODY_AXIS))


def scene_sharding(mesh: Mesh, shard_bodies: bool = False) -> NamedSharding:
    """Sharding for ``[B, N, ...]`` scene arrays: batch over ``sim`` and
    (optionally) bodies over ``body``."""
    spec = P(SIM_AXIS, BODY_AXIS) if shard_bodies else P(SIM_AXIS)
    return NamedSharding(mesh, spec)


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
