"""Evidence for the v5e-8 aggregate-throughput claim: compiled-HLO analysis
of the sharded self-feed rollout across mesh sizes.

The headline bench (`bench.py`) is single-chip; the multi-chip story is the
`sim`-axis data parallelism in `parallel/sharded.py` (SURVEY.md §5.8 —
the reference has no distributed backend at all, `utils/gpu_selector.py`
just picks one GPU).  A wall-clock scaling curve cannot be measured here:
the host exposes ONE real TPU chip, and virtual CPU devices share this
box's single core, so their wall-clock is contention, not scaling.  What
*can* be established exactly, per mesh size:

1. the sharded rollout compiles and executes on an n-device mesh
   (n in 1,2,4,8 virtual CPU devices — GSPMD partitioning is
   backend-independent, same program as the TPU path), and
2. the optimised HLO of its while-loop body contains ZERO cross-device
   collectives (all-reduce / all-gather / all-to-all / collective-permute /
   reduce-scatter / ragged-all-to-all).

(2) is the load-bearing fact: with the batch of independent sims sharded
over `sim` and no per-step communication, each chip runs exactly the
single-chip program on its shard, so aggregate rollout throughput
(sims x steps / s) is n_chips x the measured single-chip number — there is
no interconnect term to extrapolate.  As a positive control the same
counter is run over the body-sharded ring force pass (`parallel/ring.py`),
which MUST show collective-permute ops (it rotates body blocks over ICI).

Writes docs/results/sharded_scaling/{report.md,scaling.json}.

Run:  python scripts/sharded_scaling_report.py
(self-bootstraps onto a hermetic 8-virtual-device CPU backend, same
recipe as tests/conftest.py / __graft_entry__.py)
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(REPO, "docs", "results", "sharded_scaling")

COLLECTIVE_OPS = (
    "all-reduce",
    "all-gather",
    "all-to-all",
    "collective-permute",
    "reduce-scatter",
    "ragged-all-to-all",
)

# CPU-sized stand-in for the headline workload (egnn_mc, fully-connected
# rollout).  Shapes only affect tile sizes, not the partitioning structure
# GSPMD emits, so small-N evidence carries to the N=100 bench shape.
N_BODIES = 20
PER_DEVICE_BATCH = 4
ROLLOUT_STEPS = 40


def _bootstrap() -> None:
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""  # sitecustomize skips axon registration
    env["JAX_PLATFORMS"] = "cpu"
    flags = re.sub(
        r"--xla_force_host_platform_device_count=\d+", "", env.get("XLA_FLAGS", "")
    )
    env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    env["_SCALING_CHILD"] = "1"
    proc = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env)
    sys.exit(proc.returncode)


def count_collectives(hlo_text: str) -> dict:
    """Count collective *instructions* (lines defining an op), not mentions."""
    counts = {}
    for op in COLLECTIVE_OPS:
        # HLO instruction definitions look like:  %all-reduce.3 = f32[...] all-reduce(
        n = len(re.findall(rf"=\s+\S+\s+{re.escape(op)}(?:-start|-done)?\(", hlo_text))
        if n:
            counts[op] = n
    return counts


def main() -> None:
    sys.path.insert(0, REPO)

    import jax
    import jax.numpy as jnp

    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.core.scene import (
        Scene,
    )
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.core import (
        graph as G,
    )
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.models import (
        create_model,
    )
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.parallel import (
        make_mesh,
    )
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.parallel.sharded import (
        make_sharded_rollout_fn,
        shard_scene,
    )

    devices = jax.devices()
    assert len(devices) == 8, f"expected 8 virtual devices, got {len(devices)}"

    model = create_model("egnn_mc")

    def make_scene(batch):
        k = jax.random.PRNGKey(0)
        pos = jax.random.normal(k, (batch, N_BODIES, 3), jnp.float32)
        vel = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (batch, N_BODIES, 3))
        return Scene(
            pos=pos,
            vel=vel.astype(jnp.float32),
            force=jnp.zeros_like(pos),
            mass=jnp.ones((batch, N_BODIES, 1), jnp.float32),
        )

    params = model.init(
        jax.random.PRNGKey(2), make_scene(2), G.knn_mask(make_scene(2).pos, N_BODIES - 1)
    )

    rows = []
    single_pos = None
    for n in (1, 2, 4, 8):
        mesh = make_mesh(n_devices=n, devices=devices[:n])
        batch = PER_DEVICE_BATCH * n
        scene = shard_scene(make_scene(batch), mesh)
        fn = make_sharded_rollout_fn(model, ROLLOUT_STEPS, mesh)
        lowered = fn.lower(params, scene)
        compiled = lowered.compile()
        hlo = compiled.as_text()
        counts = count_collectives(hlo)
        pos, vel, survived = jax.block_until_ready(fn(params, scene))
        ok = bool(jnp.isfinite(pos).all()) and bool(jnp.isfinite(vel).all())
        rows.append(
            {
                "devices": n,
                "mesh": {k: int(v) for k, v in mesh.shape.items()},
                "batch_total": batch,
                "per_device_batch": PER_DEVICE_BATCH,
                "rollout_steps": ROLLOUT_STEPS,
                "collectives_in_optimized_hlo": counts,
                "executed_ok": ok,
                "out_shape": list(pos.shape),
            }
        )
        print(f"n={n}: mesh={dict(mesh.shape)} collectives={counts or 'NONE'} ok={ok}")

    # Positive control: the body-sharded ring force pass MUST communicate.
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.core.physics import (
        GravityParams,
    )
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.parallel.ring import (
        make_ring_acceleration,
    )

    mesh8 = make_mesh(n_devices=8, body_parallel=8, devices=devices)
    k = jax.random.PRNGKey(3)
    pos8 = jax.random.normal(k, (2, 64, 3), jnp.float32)
    mass8 = jnp.ones((2, 64, 1), jnp.float32)
    ring_fn = make_ring_acceleration(mesh8, GravityParams())
    ring_hlo = ring_fn.lower(pos8, mass8).compile().as_text()
    ring_counts = count_collectives(ring_hlo)
    print(f"ring control: collectives={ring_counts}")
    assert ring_counts.get("collective-permute", 0) > 0, (
        "positive control failed: ring pass shows no collective-permute — "
        "the counter would be blind"
    )

    # Big-N axis (SURVEY §5.7): the body-sharded ring MODEL rollout
    # (parallel/ring_egnn.py via make_body_ring_rollout_fn) must compile
    # and execute at every body-mesh size, with its communication exactly
    # the ring's collective-permutes — exactness vs the dense rollout is
    # covered by tests/test_parallel.py::test_body_ring_rollout_matches_dense.
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.parallel.sharded import (
        make_body_ring_rollout_fn,
    )

    ring_model = create_model("egnn_mc", body_ring=True)
    ring_rows = []
    for n in (2, 4, 8):
        meshb = make_mesh(n_devices=n, body_parallel=n, devices=devices[:n])
        nb = 8 * n  # bodies divisible by the ring size
        sc = Scene(
            pos=jax.random.normal(jax.random.PRNGKey(4), (2, nb, 3), jnp.float32),
            vel=0.1 * jax.random.normal(jax.random.PRNGKey(5), (2, nb, 3)),
            force=jnp.zeros((2, nb, 3), jnp.float32),
            mass=jnp.ones((2, nb, 1), jnp.float32),
        )
        params_r = model.init(
            jax.random.PRNGKey(6), sc, G.knn_mask(sc.pos, nb - 1)
        )
        fnr = make_body_ring_rollout_fn(ring_model, 10, meshb)
        hlor = fnr.lower(params_r, sc).compile().as_text()
        countsr = count_collectives(hlor)
        locr, velr, svr = jax.block_until_ready(fnr(params_r, sc))
        okr = bool(jnp.isfinite(locr).all())
        ring_rows.append(
            {
                "devices": n,
                "n_bodies": nb,
                "bodies_per_device": nb // n,
                "collectives_in_optimized_hlo": countsr,
                "executed_ok": okr,
            }
        )
        print(f"ring rollout n={n}: N={nb} collectives={countsr} ok={okr}")
        assert countsr.get("collective-permute", 0) > 0, (
            "body-ring rollout compiled without collective-permutes — the "
            "ring is not actually rotating blocks"
        )

    rollout_clean = all(not r["collectives_in_optimized_hlo"] for r in rows)
    payload = {
        "workload": {
            "model": "egnn_mc",
            "n_bodies": N_BODIES,
            "per_device_batch": PER_DEVICE_BATCH,
            "rollout_steps": ROLLOUT_STEPS,
        },
        "rollout_mesh_rows": rows,
        "ring_positive_control": ring_counts,
        "body_ring_rollout_rows": ring_rows,
        "rollout_collective_free": rollout_clean,
        "conclusion": (
            "sim-sharded rollout compiles to zero per-step cross-device "
            "collectives at every mesh size; aggregate throughput is "
            "n_chips x single-chip by construction"
        )
        if rollout_clean
        else "UNEXPECTED collectives found — see rows",
    }
    os.makedirs(OUT_DIR, exist_ok=True)
    with open(os.path.join(OUT_DIR, "scaling.json"), "w") as f:
        json.dump(payload, f, indent=2)

    with open(os.path.join(OUT_DIR, "report.md"), "w") as f:
        f.write("# Sharded-rollout scaling evidence (virtual 8-device mesh)\n\n")
        f.write(
            "Produced by `python scripts/sharded_scaling_report.py` "
            "(re-runnable; hermetic CPU backend, same GSPMD program the "
            "multi-chip TPU path compiles).  See the module docstring for "
            "why HLO collective analysis — not virtual-device wall-clock — "
            "is the valid scaling evidence on this 1-core, 1-chip host.\n\n"
        )
        f.write("| devices | mesh | total batch | collectives in optimized HLO | executed |\n")
        f.write("|---|---|---|---|---|\n")
        for r in rows:
            f.write(
                f"| {r['devices']} | {r['mesh']} | {r['batch_total']} | "
                f"{r['collectives_in_optimized_hlo'] or 'none'} | "
                f"{'ok' if r['executed_ok'] else 'FAIL'} |\n"
            )
        f.write(
            f"\nPositive control (body-sharded ring force pass, 8-way): "
            f"`{ring_counts}` — the counter detects communication when it "
            f"exists.\n\n"
        )
        f.write("## Big-N axis: body-sharded ring MODEL rollout\n\n")
        f.write(
            "The full self-feed rollout with the model's message pass on a "
            "body ring (`parallel/ring_egnn.py`): every `[B,N,N,·]` edge "
            "tensor lives as `[B,N/D,N/D,·]` per-device blocks (peak memory "
            "O(N²/D²)); the only communication is the ring's "
            "collective-permutes.  Exactness vs the dense rollout: "
            "`tests/test_parallel.py::test_body_ring_rollout_matches_dense`.\n\n"
        )
        f.write("| devices | N | bodies/device | collectives | executed |\n")
        f.write("|---|---|---|---|---|\n")
        for r in ring_rows:
            f.write(
                f"| {r['devices']} | {r['n_bodies']} | "
                f"{r['bodies_per_device']} | "
                f"{r['collectives_in_optimized_hlo']} | "
                f"{'ok' if r['executed_ok'] else 'FAIL'} |\n"
            )
        f.write("\n")
        f.write(
            "**Conclusion:** the `sim`-axis rollout partition introduces no "
            "per-step communication, so each chip runs the single-chip "
            "program on its shard of independent sims.  With the measured "
            "single-chip headline (201.9 rollout steps/s at N=100, batch 64 "
            "— BENCH_r02 basis), a v5e-8 runs 8 such shards concurrently: "
            "aggregate sims x steps/s = 8x the single-chip number "
            "(~54x the GH200 stand-in rate), with zero ICI traffic in the "
            "rollout loop.  The only multi-chip sync points are outside the "
            "hot loop (initial shard placement, final host gather).\n"
        )
    print("wrote", OUT_DIR)


if __name__ == "__main__":
    if os.environ.get("_SCALING_CHILD") != "1":
        _bootstrap()
    else:
        main()
