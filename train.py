"""Training entry point — analogue of the reference ``train.py``.

Usage::

    python train.py --config config.yaml --main.model_type egnn_mc \
        --trainer.train_steps 10 --trainer.steps_per_epoch 100

Installed console script: ``nbody-tpu-train`` (same main, see
``<pkg>/cli.py``).
"""

from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.cli import (
    set_seed,  # noqa: F401  (re-exported; used by external tooling/tests)
    train_main as main,
)

if __name__ == "__main__":
    main()
