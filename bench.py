"""Headline benchmark: self-feed rollout steps/sec at N=100 bodies.

This is the BASELINE.md north-star metric: the reference's slowest path is
~1000 *sequential* model calls with per-step Python graph rebuilds
(``helper_scripts/infer_self_feed.py:99-181``) on a GH200.  Here the whole
rollout is one jitted ``lax.scan`` on TPU; the bench tries three configs —
XLA f32, Pallas-fused f32, Pallas-fused bf16 — and reports the fastest.

Baseline number: the fastest reference model classes sustain ~30-34 train
steps/s at N=5 on GH200 (derived in BASELINE.md from
``ks_test/run_8h_cutoffs.json``); rollout steps are the same order (one
model call per step, same batch).  At N=100 the reference would be strictly
slower (O(N^2) Python-built graphs), so 30 steps/s is a *generous* stand-in
for the GH200 rollout rate we compare against.

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

# GH200 train-steps/s per model class (incl. eval overhead), derived from
# the 8h-cutoff table in BASELINE.md / SURVEY.md §6
GH200_TRAIN_STEPS_PER_SEC = {
    "ponita": 30.0,
    "graph_transformer": 34.0,
    "segnn": 6.5,
    "equiformer_v2": 6.0,
    "cgenn": 0.5,
    "egnn_mc": 34.0,  # not in the 8h table; GT-class speed is the stand-in
    "painn": 34.0,
}

import os

MODE = os.environ.get("BENCH_MODE", "rollout")  # rollout | train | datagen

# TPU rollout configs (name, use_pallas, dtype_name, pallas_tile,
# compute_dtype) — single source shared with scripts/profile_rollout.py.
# f32 tile 64 exceeds the 16M VMEM budget at He=128/N=100 (verified on
# v5e); 32 is the largest working f32 tile there.  "mixed" = f32
# coords/integration with a bf16 message stack: bf16-class speed at
# f32-class rollout stability.
TPU_ROLLOUT_CONFIGS = [
    ("xla-bfloat16", False, "bfloat16", None, ""),
    ("xla-mixed-bf16", False, "float32", None, "bfloat16"),
    ("pallas-mixed-bf16-t32", True, "float32", 32, "bfloat16"),
    ("pallas-bf16-t64", True, "bfloat16", 64, ""),
    # v3 streaming kernel (in-kernel featurize, no [B,N,N,He] HBM tensors):
    # the big-N path, also candidate at N=100 since the elem_bf16 mode
    # halves its VPU volume (ops/pallas/egnn_stream.py)
    ("stream-mixed-bf16", False, "float32", None, "bfloat16",
     {"streaming": True}),
    ("stream-mixed-ebf16", False, "float32", None, "bfloat16",
     {"streaming": True, "stream_elem_bf16": True}),
    # fc_fast (drop the [B,N,N,He] mask-multiply passes; exact for FC masks)
    # measured a NULL result at this shape — 198.3 vs 201.5 steps/s on
    # 2026-08-19 — XLA already fuses the mask into the reductions for free.
    # The option stays on the model for large-N regimes; not benched.
]
N_BODIES = int(os.environ.get("BENCH_N_BODIES", 100 if MODE == "rollout" else 5))
BATCH = int(os.environ.get("BENCH_BATCH", 64))
ROLLOUT_STEPS = int(os.environ.get("BENCH_STEPS", 500))
TRAIN_STEPS = int(os.environ.get("BENCH_TRAIN_STEPS", 100))
MODEL = os.environ.get("BENCH_MODEL", "egnn_mc")  # reference default size


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


# last-good-result cache: a remote-TPU tunnel outage at bench time must not
# leave the driver with no JSON line at all.  Every successful measurement
# is mirrored here (with a timestamp); when the backend is unreachable the
# cached line is re-emitted, explicitly marked stale with provenance.
_LAST_GOOD = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "docs", "results", "bench_last_good.json",
)


def _git_sha() -> str:
    try:
        import subprocess

        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
    except Exception:
        return ""


def emit(payload: dict) -> None:
    """Print the one-line bench JSON and mirror it to the last-good cache.

    The cache key is the metric name, so rollout/train/datagen modes don't
    clobber each other.  Self-describing provenance fields (config, shapes,
    git sha) make stale/fresh and config drift auditable across rounds."""
    payload.setdefault("n_bodies", N_BODIES)
    payload.setdefault("batch", BATCH)
    payload.setdefault("model", MODEL)
    sha = _git_sha()
    if sha:
        payload.setdefault("git_sha", sha)
    print(json.dumps(payload))
    try:
        cache = {}
        if os.path.exists(_LAST_GOOD):
            with open(_LAST_GOOD) as f:
                cache = json.load(f)
        cache[payload["metric"]] = dict(payload, measured_at=time.time())
        cache["latest"] = payload["metric"]
        with open(_LAST_GOOD, "w") as f:
            json.dump(cache, f, indent=1)
    except Exception as e:  # cache is best-effort; never fail the bench
        log(f"bench: last-good cache write failed: {e!r}")


def _metric_prefix() -> str:
    return {
        "rollout": "self_feed_rollout_steps_per_sec",
        "train": "train_steps_per_sec",
        "datagen": "datagen_sims_per_sec",
    }.get(MODE, "")


def _has_cached_result() -> bool:
    """True if the last-good cache holds a result for the current mode."""
    try:
        with open(_LAST_GOOD) as f:
            cache = json.load(f)
        prefix = _metric_prefix()
        return any(k != "latest" and k.startswith(prefix) for k in cache)
    except Exception:
        return False


def emit_stale_or_die(reason: str) -> None:
    """Backend unreachable: re-emit the cached result for the current mode
    (marked stale, with its original timestamp) and exit 0, or exit 1 with
    an explicit error JSON if no cache exists."""
    metric_prefix = _metric_prefix()
    try:
        with open(_LAST_GOOD) as f:
            cache = json.load(f)
        candidates = [
            v for k, v in cache.items()
            if k != "latest" and k.startswith(metric_prefix)
        ]
        entry = max(candidates, key=lambda v: v.get("measured_at", 0.0))
    except Exception:
        entry = None
    if entry is not None:
        entry = dict(entry, stale=True, stale_reason=reason)
        print(json.dumps(entry))
        log(f"bench: emitted STALE cached result ({reason})")
        raise SystemExit(0)
    print(
        json.dumps(
            {"metric": f"{metric_prefix or 'bench'}_unavailable", "value": 0.0,
             "unit": "steps/s", "vs_baseline": 0.0, "error": reason}
        )
    )
    raise SystemExit(1)


def make_scene(dtype, batch=None):
    b = BATCH if batch is None else batch
    pos = jax.random.normal(jax.random.PRNGKey(0), (b, N_BODIES, 3), jnp.float32)
    vel = (
        jax.random.normal(jax.random.PRNGKey(1), (b, N_BODIES, 3), jnp.float32)
        * 0.1
    )
    return Scene(
        pos=pos.astype(dtype),
        vel=vel.astype(dtype),
        force=jnp.zeros_like(pos, dtype),
        mass=jnp.ones((b, N_BODIES, 1), dtype),
    )


def pick_headline(results: dict) -> str:
    """Headline config: best steps/s SUBJECT TO rollout fidelity.

    ``results`` maps config name -> (steps/s, survived_min).  A config is
    eligible only if its min-survived-steps is within SURVIVED_TOL of the
    xla-float32 reference config's — a 1% speed edge must not buy the
    headline at the cost of dozens of survived rollout steps (round-2
    VERDICT #6: full-bf16 loses ~75 survived steps to position mantissa
    erosion; mixed-bf16 matches f32 fidelity at 99% of bf16 speed).
    Falls back to all configs if none are eligible (e.g. f32 itself
    missing)."""
    ref = results.get("xla-float32")
    eligible = results
    if ref is not None:
        ok = {k: v for k, v in results.items() if v[1] >= ref[1] - SURVIVED_TOL}
        if ok:
            eligible = ok
    return max(eligible.items(), key=lambda kv: kv[1][0])[0]


SURVIVED_TOL = 5  # steps; survived_min slack vs the f32 reference config


# per-config hooks for post-hoc analysis of the winning config only:
# name -> (steady_seconds, cost_analysis_thunk).  Computing XLA cost
# analysis for every config would re-lower/compile each one; the headline
# needs it for exactly one.
_ANALYSIS_HOOKS: dict = {}

# v5e bf16 MXU peak (TFLOP/s); the denominator for the emitted MFU field.
# The rollout's matmuls run bf16 in every headline-eligible config
# (mixed-bf16 keeps f32 only for coords/integration), so bf16 peak is the
# honest ceiling — the BENCH_NOTES ~29%-MXU analysis used the same basis.
V5E_BF16_PEAK_FLOPS = 197e12


def measure(
    use_pallas: bool, dtype, params, tile=None, label=None, compute_dtype="",
    extra_kwargs=None, batch=None,
) -> tuple:
    # use_pallas/pallas_tile/compute_dtype are egnn_mc-only knobs; other
    # models bench their plain dense path (their dtype comes from the scene)
    kwargs = {}
    if MODEL == "egnn_mc":
        kwargs["use_pallas"] = use_pallas
        if use_pallas and tile is not None:
            kwargs["pallas_tile"] = tile
        if compute_dtype:
            kwargs["compute_dtype"] = compute_dtype
        kwargs.update(extra_kwargs or {})
    elif use_pallas or compute_dtype or extra_kwargs:
        raise ValueError(f"config {label or 'pallas/mixed'} is egnn_mc-only")
    model = create_model(MODEL, **kwargs)
    scene0 = make_scene(dtype, batch)
    cast = jax.jit(
        lambda p: jax.tree_util.tree_map(lambda x: x.astype(dtype), p)
    )(params)
    fn = make_rollout_fn(model, num_steps=ROLLOUT_STEPS, num_neighbors=None)

    def run_and_sync():
        loc, vel, survived = fn(cast, scene0)
        # force full materialisation: block_until_ready is not a true barrier
        # over the axon remote backend — fetch a value instead
        checksum = float(jnp.sum(loc[:, -1]))
        return loc, vel, survived, checksum

    t0 = time.time()
    loc, vel, survived, _ = run_and_sync()
    compile_s = time.time() - t0
    t0 = time.time()
    loc, vel, survived, _ = run_and_sync()
    dt = time.time() - t0
    sps = (ROLLOUT_STEPS - 1) / dt
    name = label or f"{'pallas' if use_pallas else 'xla'}-{jnp.dtype(dtype).name}"
    smin = int(survived.min())
    log(
        f"{name}: compile+1st {compile_s:.1f}s, steady {dt:.3f}s "
        f"-> {sps:.1f} steps/s (survived min {smin})"
    )
    # only the steady time is consumed downstream (the MFU path re-lowers a
    # single apply itself); storing a cost-analysis thunk here pinned the
    # compiled executable + device buffers for the whole run (ADVICE round-4)
    _ANALYSIS_HOOKS[name] = dt
    return sps, smin


def measure_train(dtype, label) -> float:
    """Jitted training steps/s at the reference workload (N=5, batch 64,
    ``config.yaml`` model defaults; SURVEY.md §6 throughput table)."""
    import optax

    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.core import (
        graph as G,
    )
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.train.losses import (
        build_loss_fn,
    )
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.train.optim import (
        create_optimizer,
    )
    from types import SimpleNamespace

    model = create_model(MODEL)
    scene = make_scene(dtype)
    y = jnp.concatenate([scene.pos * 0.01, scene.vel], axis=-1)
    mask_fn = jax.jit(lambda sc: G.knn_mask(sc.pos, N_BODIES - 1))
    mask = mask_fn(scene)
    params = jax.jit(model.init)(jax.random.PRNGKey(2), scene, mask)
    params = jax.jit(
        lambda p: jax.tree_util.tree_map(lambda x: x.astype(dtype), p)
    )(params)
    tx = create_optimizer(0.5, model_size=model.get_model_size())
    opt_state = tx.init(params)
    loss_fn = build_loss_fn(SimpleNamespace(target="pos_dt+vel"))

    @jax.jit
    def step(params, opt_state, scene, y, mask, rng):
        # train=True + dropout rng matches the real trainer step
        # (trainer.py's lf applies with train=True and rngs={'dropout': ...})
        # — benching the eval-mode graph would omit dropout ops for
        # graph_transformer / equiformer_v2 and overstate steps/s
        rng, dk = jax.random.split(rng)

        def l(p):
            pred = model.apply(p, scene, mask, train=True, rngs={"dropout": dk})
            total, _ = loss_fn(pred, scene, y)
            return total

        loss, grads = jax.value_and_grad(l)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, rng

    rng = jax.random.PRNGKey(3)
    t0 = time.time()
    params, opt_state, loss, rng = step(params, opt_state, scene, y, mask, rng)
    _ = float(loss)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(TRAIN_STEPS):
        params, opt_state, loss, rng = step(params, opt_state, scene, y, mask, rng)
    _ = float(loss)  # barrier: fetch a value (axon-safe sync)
    dt = time.time() - t0
    sps = TRAIN_STEPS / dt
    log(f"{label}: compile+1st {compile_s:.1f}s, steady {dt:.3f}s -> {sps:.1f} steps/s")
    return sps


def main_train() -> None:
    log(f"devices: {jax.devices()} | train bench: {MODEL} N={N_BODIES} B={BATCH}")
    results = {"train-float32": measure_train(jnp.float32, "train-float32")}
    if jax.default_backend() == "tpu":
        try:
            results["train-bfloat16"] = measure_train(jnp.bfloat16, "train-bfloat16")
        except Exception as e:
            log(f"train-bfloat16 failed: {e!r}")
    best_name, best = max(results.items(), key=lambda kv: kv[1])
    log(f"best config: {best_name}")
    baseline = GH200_TRAIN_STEPS_PER_SEC.get(MODEL, GH200_BASELINE_STEPS_PER_SEC)
    emit(
        {
            "metric": f"train_steps_per_sec_n{N_BODIES}_{MODEL}",
            "value": round(best, 2),
            "unit": "steps/s",
            "vs_baseline": round(best / baseline, 2),
            "config": best_name,
        }
    )


def main_datagen() -> None:
    """Ground-truth trajectory generation throughput (BASELINE.md target:
    beat the reference's per-worker NumPy leapfrog,
    ``dataset_gravity_otf.py:96-104``).  Baseline measured live: a NumPy
    transcription of the reference integrator on this host (single process —
    the reference's pool scales this by its worker count, noted in the log).
    """
    import numpy as np

    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.core import (
        physics,
    )

    # reference datagen workload is N=5; only the rollout-mode default (100)
    # is rewritten — an explicit BENCH_N_BODIES is honored as-is
    N = N_BODIES if "BENCH_N_BODIES" in os.environ else 5
    T = int(os.environ.get("BENCH_SIM_LENGTH", 10000))
    log(f"devices: {jax.devices()} | datagen bench: B={BATCH} N={N} T={T}")

    # NumPy baseline (reference math, synthetic_sim.py:318-355), timed over
    # T//10 steps and scaled linearly
    rng = np.random.RandomState(0)
    pos = rng.randn(N, 3)
    vel = rng.randn(N, 3)
    mass = np.ones((N, 1))
    G_, soft, dt = 2.0, 0.2, 0.001

    def np_acc(pos):
        x, y, z = pos[:, 0:1], pos[:, 1:2], pos[:, 2:3]
        dx, dy, dz = x.T - x, y.T - y, z.T - z
        inv_r3 = dx**2 + dy**2 + dz**2 + soft**2
        inv_r3[inv_r3 > 0] = inv_r3[inv_r3 > 0] ** (-1.5)
        return G_ * np.hstack(((dx * inv_r3) @ mass, (dy * inv_r3) @ mass, (dz * inv_r3) @ mass))

    steps_np = max(1, T // 10)
    acc = np_acc(pos)
    t0 = time.time()
    for _ in range(steps_np):
        vel = vel + acc * dt / 2.0
        pos = pos + vel * dt
        acc = np_acc(pos)
        vel = vel + acc * dt / 2.0
    numpy_sims_per_sec = 1.0 / ((time.time() - t0) * (T / steps_np))
    log(f"numpy single-process: {numpy_sims_per_sec:.3f} sims/s (T={T})")

    key = jax.random.PRNGKey(0)
    run = lambda: physics.sample_trajectory_batch(key, BATCH, N, T=T)
    out = run()
    _ = float(jnp.sum(out[0]))  # compile + run (value fetch = barrier)
    t0 = time.time()
    out = run()
    _ = float(jnp.sum(out[0]))
    dt_s = time.time() - t0
    sims_per_sec = BATCH / dt_s
    log(f"device batch: {BATCH} sims in {dt_s:.3f}s -> {sims_per_sec:.1f} sims/s")
    emit(
        {
            "metric": f"datagen_sims_per_sec_n{N}_t{T}",
            "value": round(sims_per_sec, 2),
            "unit": "sims/s",
            "vs_baseline": round(sims_per_sec / numpy_sims_per_sec, 2),
        }
    )


def main() -> None:
    log(f"devices: {jax.devices()}")
    on_tpu = jax.default_backend() == "tpu"

    model = create_model(MODEL)
    scene0 = make_scene(jnp.float32)
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.core import (
        graph as G,
    )

    t0 = time.time()
    params = jax.jit(
        lambda key, sc: model.init(key, sc, G.knn_mask(sc.pos, N_BODIES - 1))
    )(jax.random.PRNGKey(2), scene0)
    jax.block_until_ready(params)
    log(f"init: {time.time()-t0:.1f}s")

    # BENCH_ONLY=name1,name2 restricts to a subset of configs (iteration
    # aid; xla-float32 is always kept as the survived-steps reference)
    only = {s for s in os.environ.get("BENCH_ONLY", "").split(",") if s}
    results = {}
    specs = {"xla-float32": (False, jnp.float32, None, "", None)}
    results["xla-float32"] = measure(False, jnp.float32, params)
    if on_tpu:
        for cfg in TPU_ROLLOUT_CONFIGS:
            name, use_pallas, dtype_name, tile, cdt = cfg[:5]
            if only and name not in only:
                continue
            extra = cfg[5] if len(cfg) > 5 else None
            specs[name] = (use_pallas, jnp.dtype(dtype_name), tile, cdt, extra)
            try:
                results[name] = measure(
                    use_pallas, jnp.dtype(dtype_name), params, tile, name, cdt,
                    extra,
                )
            except Exception as e:  # keep the bench robust to kernel issues
                log(f"{name} failed: {e!r}")

    best_name = pick_headline(results)
    best, best_smin = results[best_name]
    log(f"best config: {best_name} (survived_min {best_smin})")
    payload = {
        "metric": f"self_feed_rollout_steps_per_sec_n{N_BODIES}_{MODEL}",
        "value": round(best, 2),
        "unit": "steps/s",
        "vs_baseline": round(best / GH200_BASELINE_STEPS_PER_SEC, 2),
        "config": best_name,
        "rollout_steps": ROLLOUT_STEPS,
        "survived_min": best_smin,
    }
    if "xla-float32" in results:
        payload["survived_min_f32_ref"] = results["xla-float32"][1]
    if only:
        # a BENCH_ONLY-restricted run must be auditable in the payload and
        # the last-good cache, not silently replace a full-sweep headline
        # (ADVICE round-4)
        payload["bench_only"] = sorted(only)

    # MFU of the headline config: XLA's FLOP count for ONE model apply
    # (cost analysis does not multiply through a lax.scan's trip count, so
    # analysing the whole rollout under-reports by ~500x — measured), times
    # the rollout's model calls, over the measured steady time, against the
    # v5e bf16 MXU peak.  The per-apply count omits the O(B*N^2) graph
    # rebuild + integration adds of the scan body — a <1% undercount at the
    # headline shape.  Promotes the BENCH_NOTES MXU analysis into the
    # driver artifact; failure is non-fatal.  TPU-only: the ratio is
    # against the v5e peak, so a CPU run would emit a meaningless number
    # into the payload + cache (ADVICE round-4).
    try:
        if not on_tpu:
            raise RuntimeError("mfu is only meaningful on the TPU backend")
        steady_s = _ANALYSIS_HOOKS[best_name]
        use_pallas, dt_, tile, cdt, extra = specs[best_name]
        kwargs = {}
        if MODEL == "egnn_mc":
            kwargs["use_pallas"] = use_pallas
            if use_pallas and tile is not None:
                kwargs["pallas_tile"] = tile
            if cdt:
                kwargs["compute_dtype"] = cdt
            kwargs.update(extra or {})
        m = create_model(MODEL, **kwargs)
        sc = make_scene(dt_)
        msk = G.knn_mask(sc.pos, N_BODIES - 1)
        cast = jax.jit(
            lambda p: jax.tree_util.tree_map(lambda x: x.astype(dt_), p)
        )(params)
        ca = (
            jax.jit(lambda p, s, k: m.apply(p, s, k))
            .lower(cast, sc, msk)
            .compile()
            .cost_analysis()
        )
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops_apply = float(ca.get("flops", 0.0))
        flops = flops_apply * (ROLLOUT_STEPS - 1)
        if flops > 0:
            payload["mfu"] = round(flops / steady_s / V5E_BF16_PEAK_FLOPS, 4)
            payload["rollout_tflops"] = round(flops / 1e12, 2)
            log(f"mfu: {flops_apply/1e9:.1f} GFLOP/apply x {ROLLOUT_STEPS-1} "
                f"/ {steady_s:.3f}s = {payload['mfu']*100:.1f}% of v5e bf16 peak")
    except Exception as e:
        log(f"mfu analysis failed (non-fatal): {e!r}")

    # Aggregate throughput mode: the chip's sim-steps/s ceiling at B=128
    # (round-3 measured +10.5% aggregate over B=64 at slightly worse
    # latency).  One extra run of the winning config only.
    if on_tpu and os.environ.get("BENCH_SKIP_AGGREGATE") != "1":
        try:
            agg_batch = int(os.environ.get("BENCH_AGG_BATCH", 128))
            use_pallas, dt_, tile, cdt, extra = specs[best_name]
            agg_sps, agg_smin = measure(
                use_pallas, dt_, params, tile, f"{best_name}-b{agg_batch}",
                cdt, extra, batch=agg_batch,
            )
            payload["aggregate_sim_steps_per_sec"] = round(agg_sps * agg_batch, 1)
            payload["aggregate_batch"] = agg_batch
            payload["aggregate_survived_min"] = agg_smin
            log(f"aggregate: {agg_sps:.1f} steps/s x B={agg_batch} = "
                f"{agg_sps*agg_batch:.0f} sim-steps/s")
        except Exception as e:
            log(f"aggregate measurement failed (non-fatal): {e!r}")

    # Trained-params leg (round-5, VERDICT item 6): the headline's
    # survived_min attests numerical stability of the compiled rollout with
    # RANDOM-INIT params; this leg re-rolls the winning config with the
    # committed N=100-trained egnn_mc checkpoint (docs/results/
    # fidelity_n100*) so the survival stat is also grounded in a real
    # trained model at the bench shape.  Same synthetic scene as the
    # random-init leg (apples-to-apples).  Non-fatal; skip with
    # BENCH_SKIP_TRAINED=1 or override via BENCH_TRAINED_CKPT.
    if (
        on_tpu
        and MODEL == "egnn_mc"
        and os.environ.get("BENCH_SKIP_TRAINED") != "1"
    ):
        try:
            ckpt = os.environ.get("BENCH_TRAINED_CKPT") or _trained_ckpt_path()
            if ckpt:
                from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.train.checkpoint import (
                    load_checkpoint,
                )

                tparams = load_checkpoint(ckpt)["params"]
                use_pallas, dt_, tile, cdt, extra = specs[best_name]
                _, smin_t = measure(
                    use_pallas, dt_, tparams, tile,
                    f"{best_name}-trainedckpt", cdt, extra,
                )
                payload["survived_min_trained"] = smin_t
                payload["trained_ckpt"] = os.path.relpath(
                    ckpt, os.path.dirname(os.path.abspath(__file__))
                )
                log(f"trained-ckpt leg: survived_min {smin_t} ({ckpt})")
        except Exception as e:
            log(f"trained-ckpt leg failed (non-fatal): {e!r}")
    emit(payload)


def _trained_ckpt_path():
    """Newest committed N=100-trained egnn_mc checkpoint, or None."""
    import glob

    root = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "docs", "results"
    )
    cands = glob.glob(os.path.join(root, "fidelity_n100*", "*model.ckpt")) + \
        glob.glob(os.path.join(root, "egnn_n100*", "ckpt_*_model.ckpt"))
    return max(cands, key=os.path.getmtime) if cands else None


def _tpu_busy() -> bool:
    """True if another live train.py / self_feed.py process holds the chip.

    Scans /proc cmdlines read-only (never signals anything); stopped and
    zombie processes hold no live chip lease.  Matches whole argv tokens
    (basename) — a wrapper whose *argument string* mentions train.py is
    not a run."""
    import glob

    me = os.getpid()
    for p in glob.glob("/proc/[0-9]*/cmdline"):
        try:
            pid = int(p.split("/")[2])
            if pid == me:
                continue
            with open(p, "rb") as f:
                argv = f.read().decode(errors="replace").split("\0")
            with open(f"/proc/{pid}/stat") as f:
                state = f.read().rsplit(")", 1)[1].split()[0]
        except (OSError, ValueError, IndexError):
            continue
        if state in ("T", "t", "Z"):
            continue
        names = {os.path.basename(a) for a in argv if a}
        if ("train.py" in names or "self_feed.py" in names) and any(
            n.startswith("python") for n in names
        ):
            return True
    return False


def _wait_for_idle_chip(max_wait_s: float | None = None) -> None:
    """Block until no training/rollout process holds the (single) TPU.

    Benching while a queued training run owns the chip would contend and
    under-report.  Scans /proc cmdlines (read-only — never signals
    anything) for train.py / self_feed.py processes other than ourselves
    and waits them out, bounded by ``max_wait_s``.

    If the chip is STILL busy at the bound (e.g. a multi-hour chase queue
    owns it for the rest of the round) and a cached last-good result
    exists, emit that (stale-marked) instead of measuring contended — a
    contended "live" number would both under-report the headline and
    overwrite the honest cache.  With no cache, proceed contended: a low
    live number beats no JSON line.  Window mirrors the backend-probe
    policy: short when a stale fallback exists, long when not.
    """
    busy = _tpu_busy
    if max_wait_s is None:
        max_wait_s = 480.0 if _has_cached_result() else 1800.0
    deadline = time.time() + max_wait_s
    waited = False
    while busy() and time.time() < deadline:
        if not waited:
            print("bench: TPU busy (training run in progress), waiting...", file=sys.stderr)
            waited = True
        time.sleep(15.0)
    if busy():
        if _has_cached_result():
            emit_stale_or_die(
                f"chip held by a training/rollout run for {max_wait_s:.0f}s "
                "at bench time (chase queue in progress); value is the last "
                "good uncontended measurement, see measured_at"
            )
        print("bench: chip still busy and no cached result — measuring "
              "contended", file=sys.stderr)
    elif waited:
        print("bench: TPU free, starting", file=sys.stderr)


def _wait_for_healthy_backend(max_wait_s: float | None = None) -> None:
    """Fail fast (with retries) if the accelerator backend is unreachable.

    Backend init on a dropped remote-TPU tunnel hangs ~25 min before
    raising UNAVAILABLE; without this gate the bench would burn its whole
    budget inside a hung init.  Probe in bounded subprocesses and wait up
    to ``max_wait_s`` for the tunnel to recover, then error out clearly.

    The driver that consumes the one-line JSON may itself bound the bench's
    wall clock, so how long to hold out for a live measurement depends on
    whether a stale fallback exists: with a cached last-good result the
    probe window is short (a long outage then costs only a stale marker),
    without one it is long (the error line is worth avoiding).  Override
    with BENCH_BACKEND_WAIT_S.
    """
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.utils.device import (
        wait_for_backend,
    )

    if max_wait_s is None:
        env = os.environ.get("BENCH_BACKEND_WAIT_S")
        try:
            max_wait_s = float(env) if env else None
        except ValueError:
            log(f"bench: ignoring malformed BENCH_BACKEND_WAIT_S={env!r}")
            max_wait_s = None
        if max_wait_s is None:
            max_wait_s = 480.0 if _has_cached_result() else 1800.0
    if wait_for_backend(max_wait_s=max_wait_s, probe_timeout_s=90.0,
                        poll_s=60.0, verbose=True):
        return
    log(
        "bench: accelerator backend unavailable after "
        f"{max_wait_s:.0f}s of probing (remote-TPU tunnel down?) — aborting "
        "instead of hanging in backend init"
    )
    emit_stale_or_die(
        f"TPU backend unreachable for {max_wait_s:.0f}s at bench time "
        "(remote tunnel outage); value is the last good on-hardware "
        "measurement, see measured_at"
    )


if __name__ == "__main__":
    if os.environ.get("BENCH_NO_WAIT") != "1":
        _wait_for_idle_chip()
        _wait_for_healthy_backend()
    if MODE not in ("train", "datagen", "rollout"):
        raise SystemExit(
            f"unknown BENCH_MODE={MODE!r} (expected rollout | train | datagen)"
        )
    try:
        {"train": main_train, "datagen": main_datagen, "rollout": main}[MODE]()
    except SystemExit:
        raise
    except Exception as e:
        # the tunnel can drop *between* the health probe and the measurement
        # (compiles take 20-40 s); still honor the one-JSON-line contract
        log(f"bench: measurement failed: {e!r}")
        emit_stale_or_die(f"bench measurement failed mid-run: {e!r}")
