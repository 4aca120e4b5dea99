"""The training loop — TPU re-design of the reference ``trainer.py``.

One optimizer step is a single jitted XLA program: KNN graph build +
featurization + forward + loss + backward + clip + AdamW + Noam schedule all
fused on device (the reference splits this across dataloader preprocess,
model forward and torch optimizer, ``trainer.py:233-358``).  Epochs, metric
aggregation, checkpointing, self-feed orchestration, crash handling and the
run-dir artifact layout mirror the reference trainer 1:1.

Key parity points (file:line into /root/reference):
* AdamW betas/eps/wd + Noam LR      trainer.py:170-195   -> train.optim
* grad clip value/norm              trainer.py:197-205
* NaN-grad discard                  trainer.py:207-213 (optax.apply_if_finite)
* per-target % error metrics        trainer.py:480-490
* run dir runs/<model>/<timestamp>  trainer.py:66-69
* checkpoint payload                trainer.py:599-612
* crash/interrupt save              trainer.py:1064-1076
* self-feed cadence + KS logging    trainer.py:929-1010,668-886
"""

from __future__ import annotations

import datetime
import functools
import json
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core import graph as G
from ..core.physics import energy_series
from ..core.scene import Scene
from ..data.gravity_otf import GravityDatasetOtf
from ..metrics import artifacts
from ..metrics.ks import fisher_combine, ks_p
from ..models import create_model
from ..rollout.self_feed import run_self_feed
from ..utils.config import namespace_to_dict, save_config
from .checkpoint import load_checkpoint, save_checkpoint
from .logging_utils import MetricsLogger, RunningMean
from .losses import build_loss_fn, percentage_errors
from .optim import create_optimizer

ENERGY_ERROR_THRESHOLDS = [2.5, 5]  # trainer.py:27


def resolve_dtype(precision_mode: str):
    """Compute dtype for a ``precision_mode`` (reference ``trainer.py:39-44``
    precision modes).  Shared by the trainer and ``validate.py`` so an
    offline evaluation always runs in the dtype the run trained with."""
    return {
        "double": jnp.float64 if jax.config.jax_enable_x64 else jnp.float32,
        "single": jnp.float32,
        "bfloat16": jnp.bfloat16,
        # reference "autocast" (mixed precision + GradScaler) maps to
        # bfloat16 compute — TPU bf16 needs no loss scaling
        "autocast": jnp.bfloat16,
    }[precision_mode]


class Trainer:
    def __init__(
        self,
        model,
        dataset: GravityDatasetOtf,
        args,
        resolved_config=None,
        valid_dataset=None,
    ):
        self.args = args
        self.model = model
        self.dataset = dataset
        # separate validation dataset (reference train.py:39-44 builds a
        # partition="valid" dataloader: offline runs get the real valid
        # split, OTF runs an independent uncached/reseeded sim stream);
        # None falls back to the training stream's fresh unused frames
        self.valid_dataset = valid_dataset
        self.targets = args.target.split("+")
        self.num_neighbors = args.num_neighbors or (args.num_atoms - 1)
        self.dtype = resolve_dtype(getattr(args, "precision_mode", "single"))
        # TPU f32 matmuls default to one-pass bf16 multiplication; opt into
        # true f32 ("float32"/"highest") for precision-sensitive training —
        # the reference trains in f64 (config.yaml:177)
        # always set (not just when configured): the jax config is process-
        # global, so a previous Trainer in the same process (e.g. an HPO
        # trial) must not leak its precision into this one
        jax.config.update(
            "jax_default_matmul_precision",
            getattr(args, "matmul_precision", None) or None,
        )

        seed = args.seed if getattr(args, "seed", None) is not None else 0
        self._rng = jax.random.PRNGKey(seed)

        # Multi-device data parallelism over the sim axis (SURVEY.md §5.8):
        # params/opt replicated, batch sharded; XLA inserts the psum.
        self.mesh = None
        n_dev = len(jax.devices())
        if (
            getattr(args, "data_parallel", True)
            and n_dev > 1
            and args.batch_size % n_dev == 0
        ):
            from ..parallel.mesh import make_mesh, replicate, scene_sharding

            self.mesh = make_mesh()
            self._data_sharding = scene_sharding(self.mesh)
            self._replicated = replicate(self.mesh)
            print(f"Data-parallel over {n_dev} devices (sim axis)")

        # Parameter init from a dummy scene (static shapes).  Offline
        # datasets return (scene, y, edge_mask) — their cutoff-rate mask is
        # data, not a function of positions, so it rides along into the
        # jitted step instead of being recomputed in-trace.
        batch0 = dataset.get_batch()
        self._data_masks = len(batch0) == 3
        self._charged_scenes = batch0[0].charge is not None
        scene0, y0 = batch0[0], batch0[1]
        scene0 = scene0.astype(self.dtype)
        mask0 = batch0[2] if self._data_masks else G.knn_mask(
            scene0.pos, self.num_neighbors
        )
        self._rng, init_key = jax.random.split(self._rng)
        self.params = model.init(init_key, scene0, mask0)
        if args.model_type == "ponita":
            # one-time kernel std re-calibration on a real batch — the
            # reference does this mutably on the first training forward
            # (ponita nn/conv.py:115-140); here it is a pure init-time step
            from ..models.ponita import calibrate_params

            self.params = calibrate_params(model, self.params, scene0, mask0)
        self.n_params = sum(int(x.size) for x in jax.tree_util.tree_leaves(self.params))

        self.tx = create_optimizer(
            learning_rate=args.learning_rate,
            model_size=model.get_model_size(),
            factor=args.learning_rate_factor,
            warmup=args.learning_rate_warmup_steps,
            clip_value=args.clip_gradients_value,
            clip_norm=args.clip_gradients_norm,
            discard_nan_gradients=args.discard_nan_gradients,
        )
        self.opt_state = self.tx.init(self.params)

        self.loss_fn = build_loss_fn(args)
        self.step_count = 0  # counts finished epochs, like the reference
        self.best_metrics: Dict[str, float] = {}

        ts = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
        suffix = "" if args.run_name is None else f"__{args.run_name}"
        self.save_dir_path = os.path.join("runs", args.model_type, f"{ts}{suffix}")
        os.makedirs(self.save_dir_path, exist_ok=True)
        self.logger = MetricsLogger(self.save_dir_path)

        if resolved_config is not None:
            save_config(resolved_config, self.save_dir_path)
        self._save_run_artifacts()

        if args.model_path:
            self.load_model_from_checkpoint(args.model_path)

        self._train_step, self._metric_names = self._build_train_step()

    # ----------------------------------------------------------------- build

    def _build_train_step(self):
        model = self.model
        loss_fn = self.loss_fn
        tx = self.tx
        k = self.num_neighbors
        targets = self.targets

        abort_on_nan = getattr(self.args, "abort_on_nan_activations", False)

        data_masks = self._data_masks

        jit_kwargs: dict = {"donate_argnums": (0, 1)}
        if self.mesh is not None:
            ds = self._data_sharding
            repl = self._replicated
            # the shardings pytree must mirror the scene's structure:
            # offline charged scenes carry a charge leaf
            scene_sh = Scene(
                pos=ds, vel=ds, force=ds, mass=ds,
                charge=ds if self._charged_scenes else None,
            )
            in_sh = [repl, repl, scene_sh, ds]
            if data_masks:
                in_sh.append(ds)
            in_sh.append(repl)
            jit_kwargs["in_shardings"] = tuple(in_sh)

        dtype = self.dtype
        metric_names: list = []  # filled at trace time (stable order)

        @functools.partial(jax.jit, **jit_kwargs)
        def step(params, opt_state, scene: Scene, y, *mask_and_rng):
            # rng split and input casting live INSIDE the jit: the whole
            # train step is one device dispatch (critical over remote
            # backends where each eager op costs a round-trip)
            data_mask = mask_and_rng[0] if data_masks else None
            rng = mask_and_rng[-1]
            rng, dropout_rng = jax.random.split(rng)
            scene = scene.astype(dtype)
            y = y.astype(dtype)

            def lf(p):
                mask = data_mask if data_masks else G.knn_mask(scene.pos, k)
                pred = model.apply(
                    p, scene, mask, train=True, rngs={"dropout": dropout_rng}
                )
                total, terms = loss_fn(pred, scene, y)
                return total, (pred, terms)

            (loss, (pred, terms)), grads = jax.value_and_grad(lf, has_aux=True)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            if abort_on_nan:
                # skip the whole update on non-finite activations
                # (trainer.py:245-260 abort_on_nan_activations)
                ok = jnp.isfinite(pred).all()
                updates = jax.tree_util.tree_map(
                    lambda u: jnp.where(ok, u, jnp.zeros_like(u)), updates
                )
                new_opt = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(ok, new, old)
                    if hasattr(new, "dtype")
                    else new,
                    new_opt,
                    opt_state,
                )
            new_params = optax.apply_updates(params, updates)
            perc = percentage_errors(pred, y, targets)
            # one packed f32 vector: [loss, *sorted(terms), *sorted(perc)] —
            # buffered per step, fetched ONCE per epoch (no per-step blocking
            # host round-trips)
            vec = jnp.stack(
                [loss.astype(jnp.float32)]
                + [terms[n].astype(jnp.float32) for n in sorted(terms)]
                + [perc[n].astype(jnp.float32) for n in sorted(perc)]
            )
            if not metric_names:
                metric_names.extend(["loss"] + sorted(terms) + sorted(perc))
            return new_params, new_opt, rng, vec

        return step, metric_names

    def _build_layer_stats_fn(self):
        """Per-layer activation statistics via flax capture_intermediates —
        the role of the reference's model debug-stats machinery
        (``PaiNN.py:188-207`` + ``trainer.py:328-350``)."""
        model = self.model
        k = self.num_neighbors
        data_masks = self._data_masks

        @jax.jit
        def stats(params, scene: Scene, *data_mask):
            # offline datasets train on a data-provided cutoff-rate mask
            # (and their N may differ from the gravity-section num_atoms) —
            # stats must see the same graph the model trains on
            mask = data_mask[0] if data_masks else G.knn_mask(scene.pos, k)
            _, state = model.apply(
                params, scene, mask, capture_intermediates=True, mutable=["intermediates"]
            )
            import flax

            flat = flax.traverse_util.flatten_dict(state["intermediates"])
            out = {}
            for path, vals in flat.items():
                if len(path) > 3:  # top-level layers only
                    continue
                v = vals[0] if isinstance(vals, tuple) else vals
                if not hasattr(v, "dtype"):
                    continue
                name = "/".join(p for p in path if p != "__call__")
                out[f"{name}.absmax"] = jnp.max(jnp.abs(v))
                out[f"{name}.std"] = jnp.std(v)
                out[f"{name}.nan_or_inf"] = (~jnp.isfinite(v)).any()
            return out

        return stats

    def log_layer_stats(self, scene: Scene, *data_mask) -> Dict[str, float]:
        if not hasattr(self, "_layer_stats_fn"):
            self._layer_stats_fn = self._build_layer_stats_fn()
        raw = self._layer_stats_fn(self.params, scene, *data_mask)
        record = {"step": int(self.step_count)}
        for name, v in raw.items():
            record[f"debug/{name}"] = float(v)
        with open(os.path.join(self.save_dir_path, "layer_stats.jsonl"), "a") as f:
            f.write(json.dumps(record) + "\n")
        return record

    # ------------------------------------------------------------------ io

    def _save_run_artifacts(self):
        with open(os.path.join(self.save_dir_path, "training_args.json"), "w") as f:
            json.dump({"args": namespace_to_dict(self.args)}, f, indent=4, default=str)
        with open(os.path.join(self.save_dir_path, "model_params.json"), "w") as f:
            attrs = {
                k: v
                for k, v in vars(self.model).items()
                if isinstance(v, (int, float, str, bool, tuple, list, type(None)))
            }
            attrs["num_params"] = self.n_params
            json.dump(attrs, f, indent=4, default=str)
        ds_dir = os.path.join(self.save_dir_path, f"{self.args.dataset_name}_dataset")
        os.makedirs(ds_dir, exist_ok=True)
        with open(os.path.join(ds_dir, "metadata.json"), "w") as f:
            json.dump(self.dataset.get_serializable_attributes(), f, indent=4)

    @staticmethod
    def _stop_trace_safe(profile_epochs_active) -> None:
        """Close a still-open jax.profiler trace on any train() exit path."""
        if profile_epochs_active:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass

    def save_model(self, filename: str = "model.ckpt", final: bool = False):
        path = save_checkpoint(
            self.save_dir_path,
            self.params,
            self.opt_state,
            self.step_count,
            self.best_metrics,
            filename=filename,
            backend=getattr(self.args, "checkpoint_backend", "pickle"),
        )
        if final:
            print(
                f"To continue training: --trainer.model_path {path} "
                f"--config {os.path.join(self.save_dir_path, 'config.yaml')}"
            )
        return path

    def _model_restoring_links(self, model_path: str) -> None:
        """Cross-link run dirs on resume (``trainer.py:95-120``):
        ``<new>/restored_from/<old>`` and ``<old>/restoring/<new>``."""
        try:
            restored_dir = os.path.abspath(os.path.dirname(model_path))
            name = os.path.basename(os.path.normpath(restored_dir))
            link1 = os.path.join(self.save_dir_path, "restored_from", name)
            os.makedirs(os.path.dirname(link1), exist_ok=True)
            if not os.path.exists(link1):
                os.symlink(restored_dir, link1, target_is_directory=True)
            link2 = os.path.join(
                restored_dir, "restoring", os.path.basename(self.save_dir_path)
            )
            os.makedirs(os.path.dirname(link2), exist_ok=True)
            if not os.path.exists(link2):
                os.symlink(
                    os.path.abspath(self.save_dir_path), link2, target_is_directory=True
                )
        except OSError:
            pass  # symlinks are best-effort bookkeeping

    def load_model_from_checkpoint(self, path: str):
        self._model_restoring_links(path)
        ckpt = load_checkpoint(
            path, template={"params": self.params, "opt_state": self.opt_state}
        )
        # Restore into the freshly-initialised pytree structures.
        self.params = jax.tree_util.tree_map(
            lambda t, s: jnp.asarray(s, t.dtype), self.params, ckpt["params"]
        )
        self.opt_state = jax.tree_util.tree_map(
            lambda t, s: jnp.asarray(s, np.asarray(t).dtype)
            if hasattr(t, "dtype")
            else s,
            self.opt_state,
            ckpt["opt_state"],
        )
        self.step_count = ckpt.get("step_count", 0)
        self.best_metrics = ckpt.get("best_metrics", {})
        print(f"Loaded model and optimizer state from {path}")

    # ---------------------------------------------------------------- train

    def train_one_epoch(self) -> Dict[str, float]:
        n_steps = self.args.steps_per_epoch
        t_epoch = time.time()
        examples = 0
        stats_every = getattr(self.args, "debug_layer_stats_every", None)
        vecs = []  # per-step packed metric vectors (device; fetched once)
        for step_i in range(n_steps):
            batch = self.dataset.get_batch()
            scene, y = batch[0], batch[1]
            if stats_every and step_i % int(stats_every) == 0:
                extra = (batch[2],) if self._data_masks else ()
                self.log_layer_stats(scene.astype(self.dtype), *extra)
            step_args = (scene, y, batch[2]) if self._data_masks else (scene, y)
            self.params, self.opt_state, self._rng, vec = self._train_step(
                self.params, self.opt_state, *step_args, self._rng
            )
            examples += scene.pos.shape[0]
            vecs.append(vec)
        # ONE blocking device->host fetch per epoch (per-step float() fetches
        # cost a tunnel round-trip each: ~5 steps/s instead of ~200)
        arr = np.asarray(jnp.stack(vecs))
        dt = time.time() - t_epoch
        epoch_means = np.nanmean(arr, axis=0)
        log = {
            f"train/{k}": float(v)
            for k, v in zip(self._metric_names, epoch_means)
        }
        log["train/step"] = self.step_count
        log["train/steps_per_sec"] = n_steps / dt
        log["train/examples_per_sec"] = examples / dt
        self.logger.log(log)
        msg = " | ".join(f"{k.split('/')[-1]}: {v:.5f}" for k, v in log.items())
        print(f"Epoch {self.step_count} | {msg}")
        return log

    def train(self):
        start = time.time()
        train_steps = self.args.train_steps
        profile_epochs = getattr(self.args, "profile_epochs", None)
        if profile_epochs:
            # first-class XLA tracing (SURVEY.md §5.1 TPU equivalent): open
            # <run>/profile with TensorBoard/XProf or Perfetto
            jax.profiler.start_trace(os.path.join(self.save_dir_path, "profile"))
        try:
            while train_steps is None or self.step_count < train_steps:
                self.train_one_epoch()
                self.step_count += 1
                if profile_epochs and self.step_count == profile_epochs:
                    jax.profiler.stop_trace()
                    profile_epochs = None
                if self.step_count % self.args.save_model_every == 0:
                    self.save_model()
                if self.step_count % self.args.test_macros_every == 0:
                    try:
                        self.run_self_feed_eval()
                    except Exception as e:  # keep training (trainer.py:1050-1056)
                        import traceback

                        print(f"Couldn't run self-feed. Reason: {e}")
                        traceback.print_exc()
                if (
                    getattr(self.args, "do_validation", False)
                    and self.step_count % getattr(self.args, "validation_frequency", 1)
                    == 0
                ):
                    self.validate_one_epoch()
        except KeyboardInterrupt:
            print("Training interrupted. Saving model...")
            self._stop_trace_safe(profile_epochs)
            self.save_model(final=True)
            return  # final save already done — don't duplicate it below
        except Exception as e:
            self._stop_trace_safe(profile_epochs)
            self.save_model(final=True)
            self.logger.alert("Training crashed", f"{self.args.model_type}: {e}")
            raise
        self._stop_trace_safe(profile_epochs)
        self.save_model(final=True)
        print(
            f"Training for {self.step_count} steps took {time.time() - start:.2f} seconds"
        )

    # ------------------------------------------------------------ validation

    def validate_one_epoch(self, num_batches: int = 10) -> Dict[str, float]:
        """Validation over fresh OTF batches (``trainer.py:393-439``; the
        reference notes OTF data makes every batch a fresh validation batch).
        Saves ``model_best_valid_loss.ckpt`` on improvement
        (``trainer.py:456-461``)."""
        if not hasattr(self, "_valid_step"):
            model, loss_fn, k = self.model, self.loss_fn, self.num_neighbors
            targets = self.targets

            data_masks = self._data_masks

            @jax.jit
            def vstep(params, scene, y, *mask):
                m = mask[0] if data_masks else G.knn_mask(scene.pos, k)
                pred = model.apply(params, scene, m)
                total, terms = loss_fn(pred, scene, y)
                return total, terms, percentage_errors(pred, y, targets)

            self._valid_step = vstep

        vds = self.valid_dataset if self.valid_dataset is not None else self.dataset
        results = []
        for _ in range(num_batches):
            batch = vds.get_batch()
            scene, y = batch[0], batch[1]
            extra = (batch[2],) if self._data_masks else ()
            total, terms, perc = self._valid_step(
                self.params, scene.astype(self.dtype), y.astype(self.dtype), *extra
            )
            results.append((total, {**terms, **perc}))
        # ONE device->host fetch for the whole validation epoch — per-metric
        # float() fetches cost a tunnel round-trip each (same rationale as
        # the train path above)
        results = jax.device_get(results)
        means: Dict[str, RunningMean] = {}
        for total, named in results:
            means.setdefault("loss", RunningMean()).update(float(total))
            for name, v in named.items():
                means.setdefault(name, RunningMean()).update(float(v))
        log = {f"valid/{k}": m.compute() for k, m in means.items()}
        log["valid/step"] = self.step_count - 1
        self.logger.log(log)

        if log["valid/loss"] < self.best_metrics.get("valid_loss", float("inf")):
            self.best_metrics["valid_loss"] = log["valid/loss"]
            self.save_model(filename="model_best_valid_loss.ckpt")
        return log

    # ------------------------------------------------------------- self-feed

    def run_self_feed_eval(self) -> int:
        """Rollout + macro KS + energy KS for the current checkpoint
        (``trainer.py:929-1010`` + ``668-886``)."""
        print(f"Running self feed (epoch {self.step_count - 1})")
        save_dir = os.path.join(self.save_dir_path, "checkpoints", str(self.step_count))
        if getattr(self.args, "save_checkpoint_params", False):
            os.makedirs(save_dir, exist_ok=True)
            # beyond-reference: persist the evaluated params so any past
            # checkpoint can be re-rolled later (self_feed.py --draws K
            # --checkpoint checkpoints/<epoch>/model.ckpt) — the per-
            # checkpoint combined p is a stochastic draw, so re-rolling the
            # lottery at the best checkpoints is the honest follow-up
            self.save_model(
                filename=os.path.join("checkpoints", str(self.step_count), "model.ckpt")
            )
        loc_gt, vel_gt, loc_pred, vel_pred, survived = run_self_feed(
            self.model,
            self.params,
            self.dataset,
            num_steps=self.args.self_feed_limit_steps,
            num_neighbors=None,  # rollout is fully connected (infer_self_feed.py:58)
            mesh=self.mesh,  # shard the sim batch when data-parallel
            matmul_precision=getattr(self.args, "self_feed_matmul_precision", None),
            # reference parity: rollout runs without model.eval() (see
            # TrainerConfig.self_feed_train_mode) — stochastic when the
            # model has live dropout
            train_mode=getattr(self.args, "self_feed_train_mode", True),
            rng=jax.random.PRNGKey(self.step_count),
        )
        per_macro, macro_combined, _, _ = artifacts.evaluate_rollout(
            save_dir,
            loc_gt,
            vel_gt,
            loc_pred,
            vel_pred,
            save_trajectory_npys=self.args.save_trajectory_npys,
            plot=self.args.plot_macros,
            extended=self.args.plot_macros,
            interaction_strength=self.dataset.interaction_strength,
            softening=self.dataset.softening,
        )

        G_ = self.dataset.interaction_strength
        soft = self.dataset.softening
        energies = {
            "simulation": energy_series(loc_gt, vel_gt, G_, soft),
            "self_feed": energy_series(loc_pred, vel_pred, G_, soft),
        }
        pvals = {
            f"energy_{k}": ks_p(energies["simulation"][k], energies["self_feed"][k])
            for k in ("total", "potential", "kinetic")
        }
        energy_combined = fisher_combine(list(pvals.values()))
        artifacts.write_energy_metrics_json(save_dir, energies, pvals, energy_combined)

        # Energy-ratio steps-within-threshold metric (trainer.py:693-705).
        sim_total = np.asarray(energies["simulation"]["total"]).reshape(-1)
        sf_total = np.asarray(energies["self_feed"]["total"]).reshape(-1)
        m = min(len(sim_total), len(sf_total))
        ratio = np.abs(sim_total[:m] / (sf_total[:m] + 1e-12))
        steps_metric = {}
        for t in ENERGY_ERROR_THRESHOLDS:
            ok = np.where((1.0 / t < ratio) & (ratio < t))[0]
            # LAST in-band index, deliberately: exact reference semantics
            # (trainer.py:699 `mask[-1] + 1`) — a rollout that leaves the
            # band and transiently re-enters counts up to the re-entry
            steps_metric[t] = int(ok[-1] + 1) if ok.size else 0

        primary = ENERGY_ERROR_THRESHOLDS[0]
        if steps_metric[primary] >= self.best_metrics.get("self_feed_steps", 0):
            self.best_metrics["self_feed_steps"] = steps_metric[primary]
            self.save_model(filename="model_best_self_feed.ckpt")

        payload = {
            "self_feed/steps_survived": int(survived),
            "self_feed/energy_steps_within_threshold": steps_metric[primary],
            "self_feed/step": self.step_count - 1,
        }

        def _log_p(prefix: str, val: float):
            if val != val:  # NaN = "no data" (e.g. zero collision events in
                return      # a short rollout) — skip rather than log the
                            # 1e-300 floor, which would read as maximally bad
            safe = max(float(val), 1e-300) if val > 0.0 else 1e-300
            payload[prefix] = safe
            payload[f"{prefix}_log10"] = float(np.log10(safe))
            payload[f"{prefix}_neglog10"] = float(-np.log10(safe))

        for key, val in pvals.items():
            _log_p(f"self_feed/ks_{key}", val)
        _log_p("self_feed/ks_combined", energy_combined)
        for key, val in per_macro.items():
            _log_p(f"self_feed/ks_macro_{key}", val)
        _log_p("self_feed/ks_macros_combined", macro_combined)
        _log_p(
            "self_feed/ks_all_combined",
            # energy + the reference's macro set; the first-party
            # stuck_cluster_size extension is excluded here so this
            # diagnostic stays comparable with pre-round-5 run logs (it
            # joins the published combination only via combine_scored's
            # group-macro substitution rule)
            fisher_combine(
                list(pvals.values())
                + [v for k, v in per_macro.items() if k != "stuck_cluster_size"]
            ),
        )
        self.logger.log(payload)
        print(
            f"Self feed: survived={survived} "
            f"macro_combined_p={macro_combined:.3e} energy_combined_p={energy_combined:.3e}"
        )
        return int(survived)


def create_trainer_from_args(args, resolved_config=None) -> Trainer:
    """Factory mirroring ``train.main`` wiring (``train.py:35-95``): the
    dataloader registry resolves ``dataloader_type`` (default
    ``{model_type}_nbody``), so ``segnn_nbody_offline`` really trains on the
    offline charged-systems dataset with its cutoff-rate edge masks."""
    from ..data.dataloaders import create_dataloader

    model = create_model(args.model_type, **args.model_kwargs)
    dataset = create_dataloader(args, partition="train").dataset
    # reference train.py:39-44: a partition="valid" dataloader exists only
    # when do_validation is on (offline datasets load the valid_charged*
    # files; OTF valid datasets bypass the sim cache and reseed, so the
    # stream is independent of the training trajectories)
    valid_dataset = (
        create_dataloader(args, partition="valid").dataset
        if getattr(args, "do_validation", False)
        else None
    )
    return Trainer(
        model, dataset, args, resolved_config=resolved_config,
        valid_dataset=valid_dataset,
    )
