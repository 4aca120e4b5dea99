"""Standalone self-feed rollout + macro evaluation — analogue of the
reference ``self_feed.py`` / ``helper_scripts/infer_self_feed.py`` CLI.

Usage::

    python self_feed.py --run_dir runs/egnn_mc/<timestamp> \
        [--checkpoint model.ckpt] [--n_bodies 100] [--steps 500] [--plot] \
        [--draws 8 --seed 0 --train_mode auto]

``--draws K`` runs K independent evaluation draws and reports the per-draw,
best and median combined KS p (see ``<pkg>/cli.py`` for why the draw
distribution is the honest view of a checkpoint's fidelity).

Installed console script: ``nbody-tpu-self-feed``.
"""

from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.cli import (
    self_feed_main as main,
)

if __name__ == "__main__":
    main()
