"""Config system: YAML sections + dot-path CLI overrides + pydantic checks.

Mirrors the reference's two-phase parse (``utils/config.py:55-224`` +
``utils/config_models.py``): a YAML file holds ``main / models / dataloaders
/ trainers`` sections keyed by registered names; ``--section.key value`` CLI
flags override dot-paths; the resolved config is flattened into one namespace
(``strip_nested_args`` semantics) and round-tripped into the run dir for
exact reproduction.

Differences by design: model/dataloader/trainer selection goes through the
framework registries instead of ``class_path`` dynamic torch imports, and the
device field selects JAX platforms rather than a CUDA gpu id.
"""

from __future__ import annotations

import argparse
import copy
import os
from types import SimpleNamespace
from typing import Any, Dict, List, Optional, Tuple

import yaml
from pydantic import BaseModel, Field


class ValidationConfig(BaseModel):
    do_validation: bool = False
    split_ratio: float = 0.8
    validation_frequency: int = 1


class GravityDatasetConfig(BaseModel):
    """Dataset section (``utils/config_models.py`` dataloader gravity block +
    ``dataset_gravity_otf.py`` defaults)."""

    dataset_name: str = "nbody_small"
    target: str = "pos_dt+vel"
    num_atoms: int = 5
    sample_freq: int = 10
    sim_length: int = 10000
    noise_var: float = 0.0
    interaction_strength: float = 2.0
    dt: float = 0.01
    softening: float = 0.2
    vel_norm: float = 1e-16
    center_of_mass: bool = False


class OfflineDatasetConfig(BaseModel):
    """Offline charged-systems loader section
    (``SegnnNbodyOfflineDataLoaderConfig``, ``config_models.py:234-243``)."""

    dataset_name: str = "5_0_0"
    data_directory: str = "datasets_offline/data"
    max_samples: int = 1000
    frame_0: int = 30
    frame_T: int = 40
    cutoff_rate: float = 0.0
    target: str = "pos_dt+vel"


class DataloaderConfig(BaseModel):
    batch_size: int = 64
    num_neighbors: Optional[int] = None
    double_precision: bool = False
    # replay cached simulations on fresh runs (the reference default:
    # use_cached = model_path is None, n_body_dataloader.py:23)
    use_cached: bool = True
    cache_data: bool = True
    seed: Optional[int] = None
    gravity_dataset: GravityDatasetConfig = Field(default_factory=GravityDatasetConfig)
    offline_dataset: OfflineDatasetConfig = Field(default_factory=OfflineDatasetConfig)


class TrainerConfig(BaseModel):
    """Trainer section (``utils/config_models.py:290-363``)."""

    com_loss: bool = False
    energy_loss: bool = False
    momentum_loss: bool = False
    momentum_loss_weight: float = 0.0001
    position_loss_weight: float = 1.0
    velocity_loss_weight: float = 1.0
    force_loss_weight: float = 1.0
    per_atom_loss: bool = False
    precision_mode: str = "single"  # single | double | bfloat16
    learning_rate: float = 0.5
    learning_rate_factor: float = 1.0
    learning_rate_warmup_steps: int = 1000
    model_path: Optional[str] = None
    run_name: Optional[str] = None
    save_model_every: int = 10
    steps_per_epoch: int = 1000
    test_macros_every: int = 10
    train_steps: Optional[int] = None
    seed: Optional[int] = None
    clip_gradients_norm: Optional[float] = None
    clip_gradients_value: Optional[float] = None
    discard_nan_gradients: bool = False
    abort_on_nan_activations: bool = False
    debug_layer_stats_every: Optional[int] = None
    data_parallel: bool = True  # shard the sim batch across all devices
    self_feed_limit_steps: Optional[int] = None
    save_trajectory_npys: bool = True
    plot_macros: bool = True
    checkpoint_backend: str = "pickle"  # pickle | orbax (tensorstore dirs)
    # jax matmul precision overrides (TPU f32 matmuls default to one-pass
    # bf16 multiplication; the reference trains/rolls out in f64):
    matmul_precision: Optional[str] = None  # global, e.g. "float32"
    self_feed_matmul_precision: Optional[str] = None  # rollout trace only
    # Roll out with dropout active (fresh noise each step).  Reference
    # parity: its run_inference never calls model.eval(), so self-feed runs
    # in .train() mode (reference trainer.py:373 vs :410; self-feed at :1037
    # precedes the only eval() in validation :1058) — stochastic for models
    # with live dropout (equiformer_v2, graph_transformer).
    self_feed_train_mode: bool = True
    # Persist the evaluated params into checkpoints/<epoch>/model.ckpt so a
    # past checkpoint can be re-rolled (self_feed.py --draws K).  Off by
    # default: the reference only keeps final/best snapshots.
    save_checkpoint_params: bool = False
    profile_epochs: Optional[int] = None  # jax.profiler trace of first N epochs
    validation: ValidationConfig = Field(default_factory=ValidationConfig)


# repo-checkout config.yaml (a symlink to the packaged default) when running
# from a source tree; the packaged default_config.yaml when installed as a
# wheel (the reference ships its config.yaml at the repo root only)
_REPO_ROOT_CONFIG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "config.yaml",
)
_PACKAGED_CONFIG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "default_config.yaml",
)
DEFAULT_CONFIG_PATH = (
    _REPO_ROOT_CONFIG if os.path.exists(_REPO_ROOT_CONFIG) else _PACKAGED_CONFIG
)


def load_config(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def _set_dot(cfg: Dict[str, Any], dotted: str, value: Any) -> None:
    keys = dotted.split(".")
    node = cfg
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = _coerce(value)


def _coerce(v: str) -> Any:
    if not isinstance(v, str):
        return v
    low = v.lower()
    if low in ("true", "false"):
        return low == "true"
    if low in ("null", "none"):
        return None
    # PEP 515 underscore groups would make int('5_0_0') == 500, silently
    # mangling string values like run names or the offline '{I}_{S}_{H}'
    # dataset naming scheme — keep underscored tokens as strings
    if "_" not in v:
        for cast in (int, float):
            try:
                return cast(v)
            except ValueError:
                pass
    return v


def parse_args(argv: Optional[List[str]] = None) -> Tuple[SimpleNamespace, Dict[str, Any]]:
    """Parse CLI into ``(flat namespace, resolved yaml dict)``.

    Usage (mirrors reference README)::

        python -m ..train --config config.yaml --main.model_type egnn_mc \
            --model.num_layers 6 --trainer.learning_rate 0.5
    """
    parser = argparse.ArgumentParser(add_help=True)
    parser.add_argument("--config", default=DEFAULT_CONFIG_PATH)
    known, unknown = parser.parse_known_args(argv)

    cfg = load_config(known.config) if os.path.exists(known.config) else {}
    cfg.setdefault("main", {})

    # Apply --a.b.c value overrides.  `--model.X` / `--dataloader.X` /
    # `--trainer.X` route into the *selected* section entry.
    overrides: List[Tuple[str, Any]] = []
    i = 0
    while i < len(unknown):
        tok = unknown[i]
        if not tok.startswith("--"):
            raise SystemExit(f"Unexpected argument: {tok}")
        key = tok[2:]
        if "=" in key:
            key, val = key.split("=", 1)
            i += 1
        else:
            if i + 1 >= len(unknown):
                raise SystemExit(f"Missing value for --{key}")
            val = unknown[i + 1]
            i += 2
        overrides.append((key, val))

    # First pass: main.* overrides so we know the selected types.
    explicit = set()
    for key, val in overrides:
        if key.startswith("main."):
            _set_dot(cfg, key, val)
            explicit.add(key.split(".", 1)[1])
        elif key in ("model_type", "dataloader_type", "trainer_type"):
            _set_dot(cfg, f"main.{key}", val)
            explicit.add(key)

    main = cfg.get("main", {})
    # Switching the model re-derives the dataloader unless explicitly pinned.
    if "model_type" in explicit and "dataloader_type" not in explicit:
        main["dataloader_type"] = f"{main['model_type']}_nbody"
    model_type = main.get("model_type", "egnn_mc")
    dataloader_type = main.get("dataloader_type", f"{model_type}_nbody")
    trainer_type = main.get("trainer_type", "trainer_nbody")

    for key, val in overrides:
        if key.startswith("main.") or key in (
            "model_type",
            "dataloader_type",
            "trainer_type",
        ):
            continue
        if key.startswith("model."):
            _set_dot(cfg, f"models.{model_type}.{key[len('model.'):]}", val)
        elif key.startswith("dataloader."):
            _set_dot(cfg, f"dataloaders.{dataloader_type}.{key[len('dataloader.'):]}", val)
        elif key.startswith("trainer."):
            _set_dot(cfg, f"trainers.{trainer_type}.{key[len('trainer.'):]}", val)
        else:
            _set_dot(cfg, key, val)

    return flatten_args(cfg), cfg


def flatten_args(cfg: Dict[str, Any]) -> SimpleNamespace:
    """Resolve sections -> one flat namespace (``strip_nested_args``
    semantics, ``utils/config.py:126-150``)."""
    cfg = copy.deepcopy(cfg)
    main = cfg.get("main", {})
    model_type = main.get("model_type", "egnn_mc")
    dataloader_type = main.get("dataloader_type", f"{model_type}_nbody")
    trainer_type = main.get("trainer_type", "trainer_nbody")

    model_kwargs = dict(cfg.get("models", {}).get(model_type, {}) or {})
    model_kwargs.pop("class_path", None)

    dl_raw = dict(cfg.get("dataloaders", {}).get(dataloader_type, {}) or {})
    dl_raw.pop("class_path", None)
    dl_raw.pop("model_path", None)
    dl = DataloaderConfig(**dl_raw)

    tr_raw = dict(cfg.get("trainers", {}).get(trainer_type, {}) or {})
    tr_raw.pop("class_path", None)
    tr = TrainerConfig(**tr_raw)

    ns = SimpleNamespace(
        model_type=model_type,
        dataloader_type=dataloader_type,
        trainer_type=trainer_type,
        model_kwargs=model_kwargs,
        # dataloader / dataset (flattened like args.batch_size in reference)
        batch_size=dl.batch_size,
        num_neighbors=dl.num_neighbors,
        double_precision=dl.double_precision,
        use_cached=dl.use_cached,
        cache_data=dl.cache_data,
        data_seed=dl.seed,
        dataset_name=dl.gravity_dataset.dataset_name,
        target=dl.gravity_dataset.target,
        num_atoms=dl.gravity_dataset.num_atoms,
        sample_freq=dl.gravity_dataset.sample_freq,
        sim_length=dl.gravity_dataset.sim_length,
        noise_var=dl.gravity_dataset.noise_var,
        interaction_strength=dl.gravity_dataset.interaction_strength,
        dt=dl.gravity_dataset.dt,
        softening=dl.gravity_dataset.softening,
        vel_norm=dl.gravity_dataset.vel_norm,
        center_of_mass=dl.gravity_dataset.center_of_mass,
        # offline loader fields (segnn_nbody_offline, config_models.py:234-243)
        data_directory=dl.offline_dataset.data_directory,
        max_samples=dl.offline_dataset.max_samples,
        frame_0=dl.offline_dataset.frame_0,
        frame_T=dl.offline_dataset.frame_T,
        cutoff_rate=dl.offline_dataset.cutoff_rate,
    )
    if dataloader_type.endswith("_offline"):
        # the offline section owns dataset_name/target for offline runs
        ns.dataset_name = dl.offline_dataset.dataset_name
        ns.target = dl.offline_dataset.target
    for k, v in tr.model_dump().items():
        if k == "validation":
            ns.do_validation = v["do_validation"]
            ns.validation_frequency = v["validation_frequency"]
        else:
            setattr(ns, k, v)
    return ns


def save_config(cfg: Dict[str, Any], run_dir: str) -> None:
    """Round-trip the resolved config into the run dir
    (``utils/config.py:18-46``)."""
    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, "config.yaml"), "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)


def namespace_to_dict(ns: SimpleNamespace) -> Dict[str, Any]:
    return {k: v for k, v in vars(ns).items()}
