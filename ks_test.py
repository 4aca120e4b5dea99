"""KS-rank the checkpoints of a run — analogue of
``ks_test/ks_test_model_checkpoints.py``.

Usage::

    python ks_test.py runs/egnn_mc/<timestamp> [--baseline]

Installed console script: ``nbody-tpu-ks-test``.
"""

from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.cli import (
    ks_test_main as main,
)

if __name__ == "__main__":
    main()
