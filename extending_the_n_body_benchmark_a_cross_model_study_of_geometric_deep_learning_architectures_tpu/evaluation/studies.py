"""Statistical self-validation studies — the reference's de-facto test
harness (SURVEY.md §4):

* :func:`baseline_metamacros` — GT-vs-GT macro distribution comparisons
  across independent batches, scored with KL/JS divergence + KS p-values:
  the macro noise floor (``helper_scripts/baseline_metamacros.py:20-135``).
* :func:`compare_dt` — integrator dt-sensitivity: re-simulate the same
  workload at several dt values and KS-compare each macro distribution
  against the base dt (``helper_scripts/compare_dt.py:23-62``).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..core.physics import GravityParams
from ..data.gravity_otf import GravityDatasetOtf
from ..metrics import macros as M
from ..metrics.ks import fisher_combine, ks_p

MACRO_KEYS = [
    "sticking_histogram",
    "collision_histogram",
    "leaving_count",
    "sharp_turn_count_30",
    "sharp_turn_count_45",
    "com_movement",
    "group_collision_count",
]


def _hist_divergences(a: np.ndarray, b: np.ndarray, bins: int = 20):
    """KL and JS divergence between histogram estimates of two samples."""
    lo = min(a.min(), b.min())
    hi = max(a.max(), b.max())
    if lo == hi:
        hi = lo + 1.0
    edges = np.linspace(lo, hi, bins + 1)
    pa, _ = np.histogram(a, bins=edges, density=False)
    pb, _ = np.histogram(b, bins=edges, density=False)
    pa = (pa + 1e-10) / (pa.sum() + 1e-10 * bins)
    pb = (pb + 1e-10) / (pb.sum() + 1e-10 * bins)
    kl = float(np.sum(pa * np.log(pa / pb)))
    m = 0.5 * (pa + pb)
    js = float(0.5 * np.sum(pa * np.log(pa / m)) + 0.5 * np.sum(pb * np.log(pb / m)))
    return kl, js


def baseline_metamacros(
    dataset: GravityDatasetOtf,
    num_batches: int = 10,
    save_dir: Optional[str] = None,
) -> Dict:
    """Pairwise GT-vs-GT macro comparisons across ``num_batches`` fresh
    batches; returns per-macro KL/JS/KS statistics (the noise floor)."""
    batches = []
    for _ in range(num_batches):
        loc, vel, *_ = dataset.get_ground_truth_trajectories()
        batches.append(M.compute_all_macros(np.asarray(loc), np.asarray(vel)))

    stats: Dict[str, Dict[str, List[float]]] = {
        k: {"kl": [], "js": [], "ks_p": []} for k in MACRO_KEYS
    }
    for i in range(num_batches):
        for j in range(i + 1, num_batches):
            for k in MACRO_KEYS:
                kl, js = _hist_divergences(batches[i][k], batches[j][k])
                stats[k]["kl"].append(kl)
                stats[k]["js"].append(js)
                stats[k]["ks_p"].append(ks_p(batches[i][k], batches[j][k]))

    summary = {
        k: {
            "kl_mean": float(np.mean(v["kl"])),
            "js_mean": float(np.mean(v["js"])),
            "ks_p_median": float(np.nanmedian(v["ks_p"])),
            "ks_p_min": float(np.nanmin(v["ks_p"])),
        }
        for k, v in stats.items()
    }
    combined_floor = [
        fisher_combine([stats[k]["ks_p"][idx] for k in MACRO_KEYS])
        for idx in range(len(stats[MACRO_KEYS[0]]["ks_p"]))
    ]
    out = {"per_macro": summary, "combined_pvalues": combined_floor}
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        with open(os.path.join(save_dir, "baseline_metamacros.json"), "w") as f:
            json.dump(out, f, indent=2)
    return out


def compare_dt(
    base_dataset: GravityDatasetOtf,
    dt_values: Sequence[float] = (0.001, 0.002, 0.005, 0.01, 0.02, 0.05),
    save_dir: Optional[str] = None,
) -> Dict:
    """Macro sensitivity to the integrator step: KS of each macro vs the
    base dt (fixed total simulated *time*, like the reference which scales
    ``sim_length`` with dt, ``compare_dt.py:23-62``)."""
    base_loc, base_vel, *_ = base_dataset.get_ground_truth_trajectories()
    base = M.compute_all_macros(np.asarray(base_loc), np.asarray(base_vel))
    base_time = base_dataset.sim_length * base_dataset.dt

    results = {}
    for dt in dt_values:
        sim_length = max(int(round(base_time / dt)), base_dataset.sample_freq)
        sim_length -= sim_length % base_dataset.sample_freq
        ds = GravityDatasetOtf(
            dataset_name=base_dataset.dataset_name,
            target=base_dataset.target,
            batch_size=base_dataset.batch_size,
            sim_length=sim_length,
            sample_freq=base_dataset.sample_freq,
            noise_var=base_dataset.noise_var,
            num_nodes=base_dataset.num_nodes,
            interaction_strength=base_dataset.interaction_strength,
            dt=dt,
            softening=base_dataset.softening,
            cache_data=False,
        )
        loc, vel, *_ = ds.get_ground_truth_trajectories()
        mac = M.compute_all_macros(np.asarray(loc), np.asarray(vel))
        per = {k: ks_p(base[k], mac[k]) for k in MACRO_KEYS}
        results[dt] = {
            "per_macro_ks_p": per,
            "combined": fisher_combine(list(per.values())),
            "sim_length": sim_length,
        }
    out = {"base_dt": base_dataset.dt, "results": {str(k): v for k, v in results.items()}}
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        with open(os.path.join(save_dir, "compare_dt.json"), "w") as f:
            json.dump(out, f, indent=2)
    return out
