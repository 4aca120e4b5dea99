"""Checkpoint evaluation artifacts — byte-compatible with the reference.

Writes the six macro JSON files consumed by the KS tooling
(``utils/hpo_metrics.py:MACRO_FILES``), the compact
``nbody_macro_metrics.json`` energy record (``trainer.py:736-769``), and the
per-sim trajectory ``.npy`` dumps (``helper_scripts/infer_self_feed.py:
231-248``), so any reference-side analysis script can consume our run dirs
unchanged.

JSON schema per macro file (``visualization_utils.py:321-344`` etc.)::

    {"ground truth": {"timestamp": ..., "<field>": [...]},
     "predicted":    {"timestamp": ..., "<field>": [...]}}
"""

from __future__ import annotations

import json
import os
from datetime import datetime
from typing import Dict, Optional

import numpy as np

from . import macros as M
from . import ks as KS

# filename -> field key (mirrors utils/hpo_metrics.py:9-16 + max_com file,
# visualization_utils.py:220-233).
MACRO_FILES = {
    "sticking_distributions.json": "sticking_histogram",
    "collision_distributions.json": "collision_histogram",
    "leaving_distribution.json": "leaving_count",
    "sharp_turn_30_distribution.json": "sharp_turn_count_30",
    "sharp_turn_45_distribution.json": "sharp_turn_count_45",
    "max_com_distance_distribution.json": "com_movement",
    "group_collision_distribution.json": "group_collision_count",
    # first-party large-N extension (round-5): scored in place of the
    # NaN-gated group macro above NBX_GROUP_MACRO_MAX_N bodies (metrics/ks.py)
    "stuck_cluster_distribution.json": "stuck_cluster_size",
}

TITLE_SUFFIXES = ("ground truth", "predicted")


def write_macro_jsons(
    save_dir: str,
    gt_macros: Dict[str, np.ndarray],
    pred_macros: Dict[str, np.ndarray],
    timestamp: Optional[str] = None,
) -> None:
    os.makedirs(save_dir, exist_ok=True)
    ts = timestamp or datetime.now().isoformat()
    for fname, field in MACRO_FILES.items():
        if field not in gt_macros or field not in pred_macros:
            continue  # optional extension macros may be absent
        data = {
            "ground truth": {"timestamp": ts, field: np.asarray(gt_macros[field]).tolist()},
            "predicted": {"timestamp": ts, field: np.asarray(pred_macros[field]).tolist()},
        }
        with open(os.path.join(save_dir, fname), "w") as f:
            json.dump(data, f, indent=4)


def read_macro_jsons(ckpt_dir: str) -> Dict[str, Dict[str, np.ndarray]]:
    """Load macro JSONs back as ``{field: {'ground truth': arr, 'predicted': arr}}``."""
    out: Dict[str, Dict[str, np.ndarray]] = {}
    for fname, field in MACRO_FILES.items():
        path = os.path.join(ckpt_dir, fname)
        if not os.path.exists(path):
            continue
        with open(path) as f:
            data = json.load(f)
        out[field] = {
            suffix: np.asarray(data.get(suffix, {}).get(field, []), dtype=np.float64)
            for suffix in TITLE_SUFFIXES
        }
    return out


def write_energy_metrics_json(
    save_dir: str,
    energies: Dict[str, Dict[str, np.ndarray]],
    ks_pvalues: Dict[str, float],
    combined: float,
    filename: str = "nbody_macro_metrics.json",
) -> None:
    """Compact energy + KS record (``trainer.py:736-769``)."""
    os.makedirs(save_dir, exist_ok=True)
    payload = {
        "energies": {
            "simulation_total": np.asarray(energies["simulation"]["total"]).tolist(),
            "self_feed_total": np.asarray(energies["self_feed"]["total"]).tolist(),
            "simulation_potential": np.asarray(energies["simulation"]["potential"]).tolist(),
            "self_feed_potential": np.asarray(energies["self_feed"]["potential"]).tolist(),
            "simulation_kinetic": np.asarray(energies["simulation"]["kinetic"]).tolist(),
            "self_feed_kinetic": np.asarray(energies["self_feed"]["kinetic"]).tolist(),
        },
        "ks_pvalues": {
            **{k: (float(v) if v == v else float("nan")) for k, v in ks_pvalues.items()},
            "combined": float(combined) if combined == combined else float("nan"),
        },
    }
    with open(os.path.join(save_dir, filename), "w") as f:
        json.dump(payload, f)


def save_trajectories(
    save_dir: str, loc_actual, loc_pred, vel_actual, vel_pred
) -> str:
    """Per-sim ``.npy`` dumps in the reference layout
    (``infer_self_feed.py:227-248``)."""
    traj_dir = os.path.join(save_dir, "trajectories_data")
    os.makedirs(traj_dir, exist_ok=True)
    loc_actual = np.asarray(loc_actual)
    loc_pred = np.asarray(loc_pred)
    vel_actual = np.asarray(vel_actual)
    vel_pred = np.asarray(vel_pred)
    for i in range(loc_actual.shape[0]):
        np.save(os.path.join(traj_dir, f"loc_actual_sim_{i}.npy"), loc_actual[i])
        np.save(os.path.join(traj_dir, f"loc_pred_sim_{i}.npy"), loc_pred[i])
        np.save(os.path.join(traj_dir, f"vel_actual_sim_{i}.npy"), vel_actual[i])
        np.save(os.path.join(traj_dir, f"vel_pred_sim_{i}.npy"), vel_pred[i])
    return traj_dir


def evaluate_rollout(
    save_dir: str,
    loc_actual,
    vel_actual,
    loc_pred,
    vel_pred,
    save_trajectory_npys: bool = True,
    plot: bool = False,
    extended: bool = False,
    interaction_strength: float = 2.0,
    softening: float = 0.2,
):
    """Full macro + KS scoring of one rollout; writes all artifacts.

    The TPU analogue of ``plot_macros`` + ``load_macro_pvalues_from_checkpoint``:
    computes the macro distributions for ground-truth and predicted
    trajectories, writes the reference-schema JSONs, and returns
    ``(per_macro_pvalues, combined_p, gt_macros, pred_macros)``.
    """
    gt = M.compute_all_macros(np.asarray(loc_actual), np.asarray(vel_actual))
    pred = M.compute_all_macros(np.asarray(loc_pred), np.asarray(vel_pred))
    write_macro_jsons(save_dir, gt, pred)
    if save_trajectory_npys:
        save_trajectories(save_dir, loc_actual, loc_pred, vel_actual, vel_pred)
    if plot:
        try:
            from ..viz.macro_plots import plot_macro_histograms, plot_trajectories_2d

            plot_macro_histograms(save_dir, gt, pred)
            plot_trajectories_2d(save_dir, np.asarray(loc_actual), np.asarray(loc_pred))
        except Exception:
            pass
    if extended:
        from .extended_artifacts import write_all_extended

        write_all_extended(
            save_dir,
            loc_actual,
            vel_actual,
            loc_pred,
            vel_pred,
            G=interaction_strength,
            softening=softening,
            plot=plot,
        )
    per, combined = KS.macro_ks_pvalues(gt, pred)
    return per, combined, gt, pred
