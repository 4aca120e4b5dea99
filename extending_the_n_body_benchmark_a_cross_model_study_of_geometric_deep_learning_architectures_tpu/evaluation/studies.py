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
from ..metrics.ks import SCORED_MACROS, combine_scored, ks_p

# per-macro noise-floor stats cover com_movement and the first-party
# stuck_cluster_size extension too; the combined floor below uses
# combine_scored (the published six-macro basis, with stuck_cluster_size
# substituting for the NaN-gated group macro above the N gate) so it is
# distributed identically to the scoreboard's combined p-value
MACRO_KEYS = SCORED_MACROS + ["com_movement", "stuck_cluster_size"]


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
        combine_scored({k: stats[k]["ks_p"][idx] for k in MACRO_KEYS})
        for idx in range(len(stats[MACRO_KEYS[0]]["ks_p"]))
    ]
    out = {"per_macro": summary, "combined_pvalues": combined_floor}
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        with open(os.path.join(save_dir, "baseline_metamacros.json"), "w") as f:
            json.dump(out, f, indent=2)
        _plot_metamacros(save_dir, stats, combined_floor)
    return out


def _plot_metamacros(save_dir: str, stats, combined_floor) -> None:
    """KL/JS box plots per macro + combined-p noise-floor histogram
    (``helper_scripts/plot_metamacros.py:17-60``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    keys = list(stats)
    fig, axs = plt.subplots(3, 1, figsize=(12, 14))
    for ax, metric, title in zip(
        axs[:2], ("kl", "js"), ("KL divergence", "JS divergence")
    ):
        ax.boxplot([stats[k][metric] for k in keys], tick_labels=keys)
        ax.set_title(f"GT-vs-GT {title} per macro (noise floor)")
        ax.tick_params(axis="x", rotation=30)
    axs[2].hist(np.clip(combined_floor, 1e-300, None), bins=20)
    axs[2].set_xlabel("Fisher-combined p (GT vs GT)")
    axs[2].set_title("Combined p-value noise floor")
    fig.tight_layout()
    fig.savefig(os.path.join(save_dir, "baseline_metamacros.png"))
    plt.close(fig)


def compare_dt(
    base_dataset: GravityDatasetOtf,
    dt_values: Sequence[float] = (0.001, 0.002, 0.005, 0.01, 0.02, 0.05),
    save_dir: Optional[str] = None,
) -> Dict:
    """Macro sensitivity to the integrator step: KS of each macro vs the
    base dt.  Like the reference, both the *number of saved frames* and the
    *physical time between frames* are held constant across dt — the
    variant's sample_freq is ``base_sample_freq / (dt / base_dt)`` and its
    total integrator steps scale to match (``compare_dt.py:50-54``) — so
    frame-count-based macros (sticking >= 3 frames, leaving > 10 frames,
    per-frame sharp turns) see an identical sampling grid and the KS
    p-values measure integrator sensitivity only."""
    base_loc, base_vel, *_ = base_dataset.get_ground_truth_trajectories()
    base = M.compute_all_macros(np.asarray(base_loc), np.asarray(base_vel))
    frame_spacing = base_dataset.sample_freq * base_dataset.dt  # physical time
    num_frames = base_dataset.sim_length // base_dataset.sample_freq

    results = {}
    for dt in dt_values:
        sample_freq = max(int(round(frame_spacing / dt)), 1)
        sim_length = num_frames * sample_freq
        actual_spacing = sample_freq * dt
        spacing_err = abs(actual_spacing - frame_spacing) / frame_spacing
        if spacing_err > 1e-6:
            # dt doesn't divide the base frame spacing: the constant-spacing
            # invariant the docstring promises is violated, and frame-count
            # macros (sticking/leaving/sharp turns) see a different grid —
            # the KS sensitivity at this dt is confounded; say so loudly.
            import warnings

            warnings.warn(
                f"compare_dt: dt={dt} gives frame spacing {actual_spacing:.6g}"
                f" vs base {frame_spacing:.6g} ({spacing_err:.1%} off) — "
                "frame-grid macros are confounded at this dt"
            )
        ds = GravityDatasetOtf(
            dataset_name=base_dataset.dataset_name,
            target=base_dataset.target,
            batch_size=base_dataset.batch_size,
            sim_length=sim_length,
            sample_freq=sample_freq,
            noise_var=base_dataset.noise_var,
            num_nodes=base_dataset.num_nodes,
            vel_norm=base_dataset.vel_norm,
            interaction_strength=base_dataset.interaction_strength,
            dt=dt,
            softening=base_dataset.softening,
            double_precision=base_dataset.double_precision,
            center_of_mass=base_dataset.center_of_mass,
            cache_data=False,
        )
        loc, vel, *_ = ds.get_ground_truth_trajectories()
        mac = M.compute_all_macros(np.asarray(loc), np.asarray(vel))
        per = {k: ks_p(base[k], mac[k]) for k in MACRO_KEYS}
        results[dt] = {
            "per_macro_ks_p": per,
            "combined": combine_scored(per),
            "sim_length": sim_length,
            "sample_freq": sample_freq,
            "frame_spacing": actual_spacing,
            "frame_spacing_rel_error": spacing_err,
        }
    out = {"base_dt": base_dataset.dt, "results": {str(k): v for k, v in results.items()}}
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        with open(os.path.join(save_dir, "compare_dt.json"), "w") as f:
            json.dump(out, f, indent=2)
        _plot_compare_dt(save_dir, out)
    return out


def _plot_compare_dt(save_dir: str, out: Dict) -> None:
    """Combined and per-macro KS p vs dt (``compare_dt.py`` figures)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    dts = sorted(out["results"], key=float)
    fig, ax = plt.subplots(figsize=(10, 6))
    ax.plot(
        [float(d) for d in dts],
        [max(out["results"][d]["combined"], 1e-300) for d in dts],
        "o-", label="combined",
    )
    for k in MACRO_KEYS:
        ax.plot(
            [float(d) for d in dts],
            [max(out["results"][d]["per_macro_ks_p"][k], 1e-300) for d in dts],
            ".-", alpha=0.5, label=k,
        )
    ax.axvline(float(out["base_dt"]), color="gray", ls=":", label="base dt")
    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlabel("dt")
    ax.set_ylabel("KS p vs base dt")
    ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(os.path.join(save_dir, "compare_dt.png"))
    plt.close(fig)


def main(argv=None):  # pragma: no cover - thin CLI
    import argparse

    p = argparse.ArgumentParser(
        description="GT-vs-GT metamacro noise floor / dt-sensitivity studies"
    )
    p.add_argument("study", choices=["metamacros", "compare_dt"])
    p.add_argument("--out", default="figures/studies")
    p.add_argument("--num-batches", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--num-atoms", type=int, default=5)
    p.add_argument("--sim-length", type=int, default=5000)
    p.add_argument("--dt-values", type=float, nargs="+", default=None)
    args = p.parse_args(argv)

    ds = GravityDatasetOtf(
        batch_size=args.batch_size,
        num_nodes=args.num_atoms,
        sim_length=args.sim_length,
        cache_data=False,
    )
    if args.study == "metamacros":
        out = baseline_metamacros(ds, num_batches=args.num_batches, save_dir=args.out)
        for k, v in out["per_macro"].items():
            print(f"{k}: kl={v['kl_mean']:.3g} js={v['js_mean']:.3g} "
                  f"ks_p_median={v['ks_p_median']:.3g}")
    else:
        kw = {"dt_values": tuple(args.dt_values)} if args.dt_values else {}
        out = compare_dt(ds, save_dir=args.out, **kw)
        for d, r in out["results"].items():
            print(f"dt={d}: combined p = {r['combined']:.3g}")
    print(f"artifacts in {args.out}")


if __name__ == "__main__":  # pragma: no cover
    main()
