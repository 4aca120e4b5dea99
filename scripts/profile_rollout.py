"""Capture a jax.profiler trace of the headline bench rollout (TPU).

Usage (default env, chip must be free)::

    python scripts/profile_rollout.py [--config xla-bfloat16] [--steps 100] \
        [--out /tmp/rollout_trace]

Writes a TensorBoard-compatible trace directory; inspect op timings with
``python scripts/profile_rollout.py --summarize /tmp/rollout_trace`` (pulls
per-op durations out of the .trace.json.gz without TensorBoard).
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
from collections import defaultdict


def summarize(trace_dir: str, top: int = 30) -> None:
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        print(f"no .trace.json.gz under {trace_dir}")
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # keep complete events on TPU op lanes (pid/tid naming varies by backend;
    # aggregate everything with a duration and a name, then filter obvious
    # host noise)
    durs = defaultdict(float)
    counts = defaultdict(int)
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e.get("name", "")
        if not name or name.startswith(("process_", "thread_")):
            continue
        durs[name] += e["dur"]
        counts[name] += 1
    total = sum(durs.values())
    print(f"{path}\ntotal traced op-time: {total/1e3:.2f} ms")
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{d/1e3:9.2f} ms  x{counts[name]:<5d} {name[:90]}")


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="xla-bfloat16")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--n_bodies", type=int, default=100)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--out", default="/tmp/rollout_trace")
    p.add_argument("--summarize", default=None, metavar="TRACE_DIR")
    args = p.parse_args()

    if args.summarize:
        summarize(args.summarize)
        return

    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax
    import jax.numpy as jnp

    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.core import (
        graph as G,
    )
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.core.scene import (
        Scene,
    )
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.models import (
        create_model,
    )
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.rollout import (
        make_rollout_fn,
    )

    # config table shared with the headline bench (single source of truth)
    import bench

    known = {"xla-float32": (jnp.float32, "", {})}
    for name, use_pallas, dtype_name, tile, cdt in bench.TPU_ROLLOUT_CONFIGS:
        mkw = {}
        if use_pallas:
            mkw = {"use_pallas": True, "pallas_tile": tile}
        known[name] = (jnp.dtype(dtype_name), cdt, mkw)
    if args.config not in known:
        raise SystemExit(f"unknown --config {args.config}; one of {sorted(known)}")
    dtype, compute_dtype, mkw = known[args.config]
    if compute_dtype:
        mkw = {**mkw, "compute_dtype": compute_dtype}
    model = create_model("egnn_mc", **mkw)
    B, N = args.batch, args.n_bodies
    pos = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3), jnp.float32)
    vel = jax.random.normal(jax.random.PRNGKey(1), (B, N, 3), jnp.float32) * 0.1
    scene0 = Scene(
        pos=pos.astype(dtype), vel=vel.astype(dtype),
        force=jnp.zeros_like(pos, dtype), mass=jnp.ones((B, N, 1), dtype),
    )
    params = jax.jit(
        lambda key, sc: model.init(key, sc, G.knn_mask(sc.pos, N - 1))
    )(jax.random.PRNGKey(2), scene0)
    fn = make_rollout_fn(model, num_steps=args.steps, num_neighbors=None)

    # warm up (compile) outside the trace; fetch a value (true barrier over
    # the axon tunnel)
    loc, _, _ = fn(params, scene0)
    float(jnp.sum(loc[:, -1]))

    with jax.profiler.trace(args.out):
        loc, _, _ = fn(params, scene0)
        float(jnp.sum(loc[:, -1]))
    print(f"trace written to {args.out}")
    summarize(args.out)


if __name__ == "__main__":
    main()
