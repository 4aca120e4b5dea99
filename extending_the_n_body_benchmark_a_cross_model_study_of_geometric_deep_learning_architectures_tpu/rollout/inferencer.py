"""Inferencer: reusable jitted inference over trained checkpoints.

Role of the reference's ``inferencer.py`` (an alternative batch-rollout
utility not wired into the train loop): load a run dir once, then serve
single-step predictions and autoregressive rollouts.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import graph as G
from ..core.scene import Scene
from .self_feed import make_rollout_fn


class Inferencer:
    def __init__(self, run_dir: str, checkpoint: str = "model.ckpt",
                 n_bodies: Optional[int] = None):
        from ..train.restore import load_run

        self.model, self.params, self.dataset, self.args = load_run(
            run_dir, checkpoint=checkpoint, n_bodies=n_bodies
        )
        # single-step prediction uses the run's *training* graph topology;
        # rollout/evaluate default to fully connected like the trainer's
        # checkpoint evals and the self_feed.py CLI (infer_self_feed.py:58),
        # so Inferencer numbers stay comparable to the logged series
        self.num_neighbors = (
            getattr(self.args, "num_neighbors", None) or self.dataset.num_nodes - 1
        )
        # rollout knobs follow the run's own checkpoint-eval settings so
        # Inferencer numbers are comparable to the trainer's logged series
        # (bf16-vs-f32 matmul passes and live dropout both shift KS p by
        # many orders — see BENCH_NOTES.md)
        self.matmul_precision = getattr(self.args, "self_feed_matmul_precision", None)
        self.train_mode = bool(getattr(self.args, "self_feed_train_mode", True))
        self._predict = jax.jit(self._predict_impl)
        self._rollouts = {}

    def _predict_impl(self, params, scene: Scene):
        mask = G.knn_mask(scene.pos, min(self.num_neighbors, scene.pos.shape[1] - 1))
        return self.model.apply(params, scene, mask)

    def predict(self, scene: Scene) -> jnp.ndarray:
        """One-step prediction ``[B, N, 3k]`` for a dense scene batch."""
        return self._predict(self.params, scene)

    def rollout(
        self, scene0: Scene, num_steps: int, rng=None,
        num_neighbors: Optional[int] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, int]:
        """Autoregressive rollout from an initial scene; returns
        ``(loc [B,T,N,3], vel [B,T,N,3], steps_survived)``.

        ``num_neighbors=None`` (default) rolls out fully connected — the
        basis of the trainer's checkpoint evals and the reference's
        ``run_inference`` — pass ``self.num_neighbors`` to use the run's
        training KNN graph instead."""
        key = (num_steps, num_neighbors)
        if key not in self._rollouts:
            self._rollouts[key] = make_rollout_fn(
                self.model, num_steps,
                num_neighbors=num_neighbors,
                target=self.dataset.target,
                matmul_precision=self.matmul_precision,
                train_mode=self.train_mode,
            )
        fn = self._rollouts[key]
        if self.train_mode:
            loc, vel, survived = fn(
                self.params, scene0, rng if rng is not None else jax.random.PRNGKey(0)
            )
        else:
            loc, vel, survived = fn(self.params, scene0)
        return loc, vel, int(survived.min())

    def evaluate(self, num_steps: Optional[int] = None, save_dir: Optional[str] = None,
                 rng=None, num_neighbors: Optional[int] = None):
        """Fresh-GT rollout + macro KS scoring (run_inference semantics).

        Fully connected by default (``num_neighbors=None``), matching the
        trainer's checkpoint evals and ``self_feed.py`` so the returned
        p-values are directly comparable to the run's logged series."""
        from ..metrics import artifacts
        from .self_feed import run_self_feed

        loc_gt, vel_gt, loc_pred, vel_pred, survived = run_self_feed(
            self.model, self.params, self.dataset, num_steps=num_steps,
            num_neighbors=num_neighbors,
            matmul_precision=self.matmul_precision,
            train_mode=self.train_mode,
            rng=rng,
        )
        if save_dir:
            per, combined, _, _ = artifacts.evaluate_rollout(
                save_dir, loc_gt, vel_gt, loc_pred, vel_pred
            )
            return {"steps_survived": survived, "per_macro": per, "combined": combined}
        from ..metrics import macros as M
        from ..metrics.ks import macro_ks_pvalues
        import numpy as np

        gt = M.compute_all_macros(np.asarray(loc_gt), np.asarray(vel_gt))
        pred = M.compute_all_macros(np.asarray(loc_pred), np.asarray(vel_pred))
        per, combined = macro_ks_pvalues(gt, pred)
        return {"steps_survived": survived, "per_macro": per, "combined": combined}
