"""Standalone self-feed rollout + macro evaluation — analogue of the
reference ``self_feed.py`` / ``helper_scripts/infer_self_feed.py`` CLI.

Usage::

    python self_feed.py --run_dir runs/egnn_mc/<timestamp> \
        [--checkpoint model.ckpt] [--n_bodies 100] [--steps 500] [--plot]
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run_dir", required=True)
    p.add_argument("--checkpoint", default="model.ckpt")
    p.add_argument("--n_bodies", type=int, default=None)
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--plot", action="store_true")
    p.add_argument("--out", default=None, help="output dir (default: run_dir/generated_trajectories)")
    args = p.parse_args(argv)

    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.metrics import (
        artifacts,
    )
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.rollout import (
        run_self_feed,
    )
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.train.restore import (
        load_run,
    )

    model, params, dataset, targs = load_run(
        args.run_dir, checkpoint=args.checkpoint, n_bodies=args.n_bodies
    )
    loc_gt, vel_gt, loc_pred, vel_pred, survived = run_self_feed(
        model, params, dataset, num_steps=args.steps, batch_size=args.batch_size
    )
    out = args.out or os.path.join(args.run_dir, "generated_trajectories")
    per, combined, _, _ = artifacts.evaluate_rollout(
        out, loc_gt, vel_gt, loc_pred, vel_pred, plot=args.plot
    )
    print(f"steps survived: {survived}")
    for k, v in per.items():
        print(f"  ks p [{k}]: {v:.4g}")
    print(f"combined macro p: {combined:.4g}")
    print(f"artifacts written to {out}")


if __name__ == "__main__":
    main()
