"""Device mesh, shardings, multi-chip train/datagen/rollout."""

from .mesh import make_mesh, scene_sharding, replicate  # noqa: F401
from .sharded import (  # noqa: F401
    make_sharded_train_step,
    shard_scene,
    sharded_datagen,
    make_sharded_rollout_fn,
)
from .ring import make_ring_acceleration  # noqa: F401
