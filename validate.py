"""One-step validation of a trained checkpoint — analogue of the reference
``validate.py``: loads a run, draws fresh on-the-fly batches and reports the
mean loss + per-target percentage errors (the OTF dataset makes every batch
a validation batch — ``trainer.py:393-401``).

Usage::

    python validate.py --run_dir runs/egnn_mc/<ts> [--batches 10]
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run_dir", required=True)
    p.add_argument("--checkpoint", default="model.ckpt")
    p.add_argument("--batches", type=int, default=10)
    args = p.parse_args(argv)

    import jax

    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.core import (
        graph as G,
    )
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.train.losses import (
        build_loss_fn,
        percentage_errors,
    )
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.train.restore import (
        load_run,
    )

    import jax.numpy as jnp

    model, params, dataset, targs = load_run(args.run_dir, checkpoint=args.checkpoint)
    loss_fn = build_loss_fn(targs)
    k = getattr(targs, "num_neighbors", None) or dataset.num_nodes - 1
    targets = targs.target.split("+")
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.train.trainer import (
        resolve_dtype,
    )

    # evaluate in the run's training dtype so valid/loss is comparable to
    # the trainer's own logged validation (trainer casts via scene.astype)
    dtype = resolve_dtype(getattr(targs, "precision_mode", "single"))

    @jax.jit
    def evaluate(params, scene, y):
        mask = G.knn_mask(scene.pos, k)
        pred = model.apply(params, scene, mask)
        total, terms = loss_fn(pred, scene, y)
        return total, terms, percentage_errors(pred, y, targets)

    totals, all_terms, all_perc = [], {}, {}
    for _ in range(args.batches):
        batch = dataset.get_batch()
        scene, y = batch[0], batch[1]
        total, terms, perc = evaluate(
            params, scene.astype(dtype), y.astype(dtype)
        )
        totals.append(float(total))
        for key, v in terms.items():
            all_terms.setdefault(key, []).append(float(v))
        for key, v in perc.items():
            all_perc.setdefault(key, []).append(float(v))

    print(f"valid/loss: {sum(totals)/len(totals):.6f} over {args.batches} batches")
    for key, vals in all_terms.items():
        print(f"valid/{key}: {sum(vals)/len(vals):.6f}")
    for key, vals in all_perc.items():
        print(f"valid/{key}: {sum(vals)/len(vals):.3f}%")


if __name__ == "__main__":
    main()
