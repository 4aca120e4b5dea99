"""One-step validation of a trained checkpoint — analogue of the reference
``validate.py``: loads a run, draws fresh on-the-fly batches and reports the
mean loss + per-target percentage errors (the OTF dataset makes every batch
a validation batch — ``trainer.py:393-401``).

Usage::

    python validate.py --run_dir runs/egnn_mc/<ts> [--batches 10]

Installed console script: ``nbody-tpu-validate``.
"""

from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.cli import (
    validate_main as main,
)

if __name__ == "__main__":
    main()
