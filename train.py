"""Training entry point — analogue of the reference ``train.py``.

Usage::

    python train.py --config config.yaml --main.model_type egnn_mc \
        --trainer.train_steps 10 --trainer.steps_per_epoch 100
"""

from __future__ import annotations

import random

import numpy as np

from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.train.trainer import (
    create_trainer_from_args,
)
from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.utils.config import (
    parse_args,
)


def set_seed(seed):
    """Deterministic seeding (``train.py:22-32`` in the reference)."""
    if seed is None:
        return
    random.seed(seed)
    np.random.seed(seed)


def main(argv=None):
    args, resolved = parse_args(argv)
    set_seed(getattr(args, "seed", None))
    trainer = create_trainer_from_args(args, resolved_config=resolved)
    print(
        f"Training {args.model_type} | params: {trainer.n_params:,} | "
        f"run dir: {trainer.save_dir_path}"
    )
    trainer.train()


if __name__ == "__main__":
    main()
