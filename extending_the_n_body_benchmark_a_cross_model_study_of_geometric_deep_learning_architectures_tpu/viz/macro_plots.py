"""Macro histogram + trajectory plots (matplotlib, headless).

Covers the PNG outputs of ``datasets/nbody/visualization_utils.py`` macro
multiplots (GT vs predicted histograms with shared bin edges) and the static
3D->2D trajectory plot.  plotly is not available in this image; interactive
HTML is emitted via matplotlib's HTML writer where needed.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

_MACRO_PLOTS = {
    # field -> (filename, xlabel, bins)
    "sticking_histogram": ("sticking_distribution.png", "Sticking Count", 50),
    "collision_histogram": ("collision_distribution.png", "Collision Count", 50),
    "leaving_count": ("leaving_distribution.png", "Leaving Count", 6),
    "sharp_turn_count_30": ("sharp_turns_distribution_30.png", "Sharp Turns Count", 60),
    "sharp_turn_count_45": ("sharp_turns_distribution_45.png", "Sharp Turns Count", 60),
    "com_movement": (
        "max_com_distance_distribution.png",
        "Max CoM Distance",
        60,
    ),
    "group_collision_count": (
        "group_collision_distribution_multiplot.png",
        "Group Collision Count",
        50,
    ),
}


def plot_macro_histograms(
    save_dir: str, gt: Dict[str, np.ndarray], pred: Dict[str, np.ndarray]
) -> None:
    """GT-vs-predicted histogram pair per macro, shared bin edges
    (layout of e.g. ``visualization_utils.py:236-319``)."""
    os.makedirs(save_dir, exist_ok=True)
    for field, (fname, xlabel, bins) in _MACRO_PLOTS.items():
        if field not in gt or field not in pred:
            continue
        fig, axs = plt.subplots(2, 1, figsize=(10, 12), sharex=True, sharey=True)
        _hist_pair(
            axs, gt[field], pred[field], xlabel, bins=bins,
            title_fmt="{xlabel} Distribution — {title}",
        )
        fig.tight_layout()
        fig.savefig(os.path.join(save_dir, fname))
        plt.close(fig)


def plot_trajectories_2d(
    save_dir: str,
    loc_actual: np.ndarray,
    loc_pred: np.ndarray,
    max_sims: int = 4,
    filename: str = "trajectories_3D_to_2D.png",
) -> None:
    """Static 3D->2D projected trajectories GT vs predicted
    (role of ``plot_trajectories_static_3D_to_2D_multiplot``)."""
    os.makedirs(save_dir, exist_ok=True)
    n_sims = min(max_sims, loc_actual.shape[0])
    fig, axs = plt.subplots(n_sims, 2, figsize=(12, 5 * n_sims), squeeze=False)
    for s in range(n_sims):
        for c, (loc, title) in enumerate(
            [(loc_actual, "ground truth"), (loc_pred, "predicted")]
        ):
            ax = axs[s][c]
            for b in range(loc.shape[2]):
                ax.plot(loc[s, :, b, 0], loc[s, :, b, 1], alpha=0.6, lw=0.8)
            ax.set_title(f"sim {s} — {title}")
            ax.set_aspect("equal", adjustable="datalim")
    fig.tight_layout()
    fig.savefig(os.path.join(save_dir, filename))
    plt.close(fig)


def _hist_pair(axs, g, p, xlabel, bins=60, title_fmt="{xlabel} — {title}"):
    """Shared-bin GT-vs-predicted histogram pair (single implementation for
    both the macro and extended multiplots).  NaN-robust: exploded rollouts
    can carry NaN frames."""
    g, p = np.asarray(g, np.float64).ravel(), np.asarray(p, np.float64).ravel()
    lo = min(np.nanmin(g, initial=np.inf), np.nanmin(p, initial=np.inf))
    hi = max(np.nanmax(g, initial=-np.inf), np.nanmax(p, initial=-np.inf))
    if not np.isfinite(lo) or not np.isfinite(hi):
        lo, hi = 0.0, 1.0
    if lo == hi:
        hi = lo + 1.0
    edges = np.linspace(lo, hi, bins + 1)
    for ax, data, title in zip(axs, (g, p), ("Ground Truth", "Predicted")):
        ax.hist(data[np.isfinite(data)], bins=edges, alpha=0.7, edgecolor="black")
        ax.set_xlabel(xlabel)
        ax.set_ylabel("Frequency")
        ax.set_title(title_fmt.format(xlabel=xlabel, title=title))


def plot_extended_multiplots(
    save_dir: str,
    loc: np.ndarray,
    vel: np.ndarray,
    energies: Dict[str, np.ndarray] | None = None,
    max_sims: int = 16,
) -> None:
    """The non-macro multiplot PNGs of ``plot_macros``
    (``helper_scripts/plot_macros.py:39-50``): feature / difference /
    momentum distributions, per-sim energy curves, energy distributions
    across sims.  ``loc``/``vel``: ``[2, S, T, N, 3]`` (gt, pred);
    ``energies``: ``{suffix: [S, T, 3]}`` (kinetic, potential, total)."""
    os.makedirs(save_dir, exist_ok=True)

    # feature distributions (visualization_utils.py:525-603)
    fig, axs = plt.subplots(2, 2, figsize=(14, 10))
    _hist_pair(axs[:, 0], loc[0], loc[1], "Position")
    _hist_pair(axs[:, 1], vel[0], vel[1], "Velocity")
    fig.tight_layout()
    fig.savefig(os.path.join(save_dir, "feature_distributions.png"))
    plt.close(fig)

    # frame-to-frame difference distributions (:606-681)
    fig, axs = plt.subplots(2, 2, figsize=(14, 10))
    _hist_pair(axs[:, 0], np.diff(loc[0], axis=1), np.diff(loc[1], axis=1),
               "Position Difference")
    _hist_pair(axs[:, 1], np.diff(vel[0], axis=1), np.diff(vel[1], axis=1),
               "Velocity Difference")
    fig.tight_layout()
    fig.savefig(os.path.join(save_dir, "difference_distributions.png"))
    plt.close(fig)

    # momentum statistics (:944-998): per-sim time-mean |Σv|
    fig, axs = plt.subplots(2, 1, figsize=(10, 10), sharex=True)
    mom = [np.linalg.norm(vel[b].sum(axis=2), axis=-1).mean(axis=1) for b in (0, 1)]
    _hist_pair(axs, mom[0], mom[1], "Mean Total Momentum", bins=30)
    fig.tight_layout()
    fig.savefig(os.path.join(save_dir, "momentum_statistics_multiplot.png"))
    plt.close(fig)

    if energies is not None:
        suffixes = list(energies)
        # per-sim total-energy curves (plot_energies_of_all_sims_multiplot)
        fig, axs = plt.subplots(len(suffixes), 1, figsize=(12, 10), sharex=True)
        for ax, sfx in zip(np.atleast_1d(axs), suffixes):
            e = np.asarray(energies[sfx])
            for s in range(min(max_sims, e.shape[0])):
                ax.plot(e[s, :, 2], alpha=0.5, lw=0.8)
            ax.set_title(f"Total energy per sim — {sfx}")
            ax.set_ylabel("Energy")
        ax.set_xlabel("step")
        fig.tight_layout()
        fig.savefig(os.path.join(save_dir, "energies_of_all_sims.png"))
        plt.close(fig)

        # energy distributions across sims (time-mean KE/PE/TE)
        fig, axs = plt.subplots(2, 3, figsize=(16, 9))
        for i, label in enumerate(["Kinetic", "Potential", "Total"]):
            means = [np.asarray(energies[s])[:, :, i].mean(axis=1) for s in suffixes]
            _hist_pair(axs[:, i], means[0], means[-1], f"{label} Energy", bins=30)
        fig.tight_layout()
        fig.savefig(
            os.path.join(save_dir, "energy_distributions_across_all_sims.png")
        )
        plt.close(fig)


def plot_pvalue_series(
    save_dir: str,
    steps,
    combined,
    per_metric: Dict[str, list] | None = None,
    filename: str = "combined_pvalues.png",
) -> None:
    """Combined/per-metric p-value vs checkpoint curves on a log axis
    (role of the plotly charts in ``trainer.py:819-884`` and
    ``ks_test/ks_test_model_checkpoints.py:191-317``)."""
    os.makedirs(save_dir, exist_ok=True)
    fig, ax = plt.subplots(figsize=(10, 6))
    ax.plot(steps, np.clip(combined, 1e-300, None), "o-", label="combined p")
    if per_metric:
        for k, ys in per_metric.items():
            ys = np.asarray(ys, dtype=np.float64)
            if np.all(np.isnan(ys)):
                continue
            ax.plot(steps, np.clip(ys, 1e-300, None), ".-", alpha=0.6, label=k)
    ax.set_yscale("log")
    ax.axhline(0.05, color="red", ls="--", lw=0.8, label="p = 0.05")
    ax.set_xlabel("checkpoint")
    ax.set_ylabel("p-value (Fisher)")
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(os.path.join(save_dir, filename))
    plt.close(fig)
