"""Big-N rollout bench: dense XLA vs the v3 streaming kernel on one chip.

Round-2 VERDICT #5: demonstrate SURVEY §5.7's big-N story end-to-end.  The
reference's scale ceiling is 1500 bodies *rendered offline from saved
ground truth* (``helper_scripts/vis_script.py:7-10``) — it never rolls a
model out at big N at all (its PyG rollout rebuilds a Python graph per
step).  Here the same self-feed rollout (`rollout/self_feed.py`, one jitted
``lax.scan``) runs at N=256..1024 in two single-chip configurations:

* **dense** — the stock XLA path: materialises ``[B, N, N, He]`` message
  tensors per layer (HBM traffic grows O(N²·He));
* **streaming** — ``EGNNMC(streaming=True)``: the sender-tile Pallas kernel
  (``ops/pallas/egnn_stream.py``) keeps every per-edge tensor in VMEM and
  streams only the O(B·N²) mask from HBM.

The multi-chip continuation of this axis is the body-sharded ring rollout
(``parallel.sharded.make_body_ring_rollout_fn``, exactness-tested on the
8-device virtual mesh in ``tests/test_parallel.py``).

Run on TPU:  python scripts/bign_bench.py [--steps 50] [--out docs/results/bign]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.core.scene import (  # noqa: E402
    Scene,
)
from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.models import (  # noqa: E402
    create_model,
)
from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.rollout.self_feed import (  # noqa: E402
    make_rollout_fn,
)

# (N, B): batch shrinks with N to keep the [B,T,N,3] outputs and the dense
# path's [B,N,N,He] tensors inside HBM at the big end.  Override with e.g.
# BIGN_SHAPES="2048:1,4096:1" for the beyond-dense regime.
SHAPES = [(256, 16), (512, 8), (1024, 2)]
if os.environ.get("BIGN_SHAPES"):
    SHAPES = [tuple(int(x) for x in s.split(":"))
              for s in os.environ["BIGN_SHAPES"].split(",")]
KW = dict(num_layers=6, hidden_node_dim=128, hidden_edge_dim=128,
          hidden_coord_dim=128, compute_dtype="bfloat16")


def make_scene(B, N):
    pos = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3), jnp.float32)
    vel = jax.random.normal(jax.random.PRNGKey(1), (B, N, 3), jnp.float32) * 0.1
    return Scene(pos=pos, vel=vel, force=jnp.zeros_like(pos),
                 mass=jnp.ones((B, N, 1), jnp.float32))


def measure(model, params, scene, steps):
    fn = make_rollout_fn(model, num_steps=steps, num_neighbors=None)
    t0 = time.time()
    loc, vel, sv = fn(params, scene)
    _ = float(jnp.sum(loc[:, -1]))  # value fetch = barrier over the tunnel
    compile_s = time.time() - t0
    t0 = time.time()
    loc, vel, sv = fn(params, scene)
    _ = float(jnp.sum(loc[:, -1]))
    dt = time.time() - t0
    return (steps - 1) / dt, compile_s, int(sv.min())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--tile-i", type=int, default=32)
    # tile-j > 128 crashes the Mosaic compiler at this VMEM footprint
    # (see egnn_stream.py tile clamp; measured 2026-08-20)
    ap.add_argument("--tile-j", type=int, default=128)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "results", "bign"))
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", flush=True)

    rows = []
    for N, B in SHAPES:
        scene = make_scene(B, N)
        dense = create_model("egnn_mc", **KW)
        stream = create_model("egnn_mc", streaming=True, pallas_tile=args.tile_i,
                              stream_tile_j=args.tile_j, **KW)
        from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.core import (
            graph as G,
        )

        # params are N-independent (shared EGNN block): init on a small
        # scene so the dense init forward never OOMs in the beyond-dense
        # regime (N=4096 dense init would allocate [B,N,N,He])
        init_scene = make_scene(1, min(N, 64))
        params = jax.jit(
            lambda k, sc: dense.init(
                k, sc, G.knn_mask(sc.pos, min(N, 64) - 1))
        )(jax.random.PRNGKey(2), init_scene)
        jax.block_until_ready(params)
        for name, model in (("dense-xla", dense), ("streaming-v3", stream)):
            try:
                sps, comp, sv = measure(model, params, scene, args.steps)
                print(f"N={N:5d} B={B:3d} {name:13s}: {sps:8.2f} steps/s "
                      f"(compile {comp:.1f}s, survived_min {sv})", flush=True)
                rows.append({"n_bodies": N, "batch": B, "path": name,
                             "steps_per_sec": round(sps, 2),
                             "compile_s": round(comp, 1), "survived_min": sv})
            except Exception as e:
                print(f"N={N:5d} B={B:3d} {name:13s}: FAILED {str(e)[:200]}",
                      flush=True)
                rows.append({"n_bodies": N, "batch": B, "path": name,
                             "error": str(e)[:500]})

    os.makedirs(args.out, exist_ok=True)
    payload = {
        "rollout_steps": args.steps,
        "model": "egnn_mc L6 H128 mixed-bf16",
        "tile_i": args.tile_i, "tile_j": args.tile_j,
        "device": str(jax.devices()[0]),
        "rows": rows,
    }
    with open(os.path.join(args.out, "bign_bench.json"), "w") as fh:
        json.dump(payload, fh, indent=1)
    print(f"wrote {args.out}/bign_bench.json", flush=True)


if __name__ == "__main__":
    main()
