"""Headline benchmark: self-feed rollout steps/sec at N=100 bodies.

This is the BASELINE.md north-star metric: the reference's slowest path is
~1000 *sequential* model calls with per-step Python graph rebuilds
(``helper_scripts/infer_self_feed.py:99-181``) on a GH200.  Here the whole
rollout is one jitted ``lax.scan`` on TPU.

Baseline number: the fastest reference model classes sustain ~30-34 train
steps/s at N=5 on GH200 (derived in BASELINE.md from
``ks_test/run_8h_cutoffs.json``); rollout steps are the same order (one model
call per step, same batch).  At N=100 the reference would be strictly slower
(O(N^2) edges in Python-built graphs), so 30 steps/s is a *generous* stand-in
for the GH200 rollout rate that we compare against.

Prints exactly one JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.core.scene import (
    Scene,
)
from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.models import (
    create_model,
)
from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.rollout import (
    make_rollout_fn,
)

GH200_BASELINE_STEPS_PER_SEC = 30.0  # see module docstring

N_BODIES = 100
BATCH = 64
ROLLOUT_STEPS = 500
MODEL = "egnn_mc"  # flagship; reference default config (6 layers, 128 wide)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    key = jax.random.PRNGKey(0)
    log(f"devices: {jax.devices()}")

    model = create_model(MODEL)
    pos = jax.random.normal(key, (BATCH, N_BODIES, 3), jnp.float32)
    vel = jax.random.normal(jax.random.PRNGKey(1), (BATCH, N_BODIES, 3), jnp.float32) * 0.1
    scene0 = Scene(
        pos=pos, vel=vel, force=jnp.zeros_like(pos), mass=jnp.ones((BATCH, N_BODIES, 1))
    )

    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.core import (
        graph as G,
    )

    mask = G.knn_mask(scene0.pos, N_BODIES - 1)
    t0 = time.time()
    params = model.init(jax.random.PRNGKey(2), scene0, mask)
    log(f"init: {time.time()-t0:.1f}s")

    fn = make_rollout_fn(model, num_steps=ROLLOUT_STEPS, num_neighbors=None)

    t0 = time.time()
    loc, vel_out, survived = fn(params, scene0)
    jax.block_until_ready(loc)
    log(f"compile+first run: {time.time()-t0:.1f}s")

    t0 = time.time()
    loc, vel_out, survived = fn(params, scene0)
    jax.block_until_ready(loc)
    dt = time.time() - t0
    steps_per_sec = (ROLLOUT_STEPS - 1) / dt
    log(
        f"rollout: {ROLLOUT_STEPS-1} steps x {BATCH} sims x {N_BODIES} bodies "
        f"in {dt:.3f}s -> {steps_per_sec:.1f} steps/s"
    )

    print(
        json.dumps(
            {
                "metric": f"self_feed_rollout_steps_per_sec_n{N_BODIES}_{MODEL}",
                "value": round(steps_per_sec, 2),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / GH200_BASELINE_STEPS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
