"""Secondary rollout artifacts: feature/difference/momentum/energy records.

Completes the ``plot_macros`` output set beyond the six scored macro files
(``helper_scripts/plot_macros.py:38-50``):

* ``feature_distributions.json``   (``visualization_utils.py:525-603``)
* ``difference_distributions.json`` (``:606-681``)
* ``momentum_statistics.json``      (``:944-998``)
* ``energy_statistics.json``        (``:1005-1090``)

Schema per file: ``{suffix: {"timestamp": ..., <fields>}}`` with suffixes
``ground truth`` / ``predicted``.  The raw flattened value lists the
reference stores are capped at ``max_items`` samples here (the reference
dumps up to ~1M floats per file; nothing downstream reads more than the
distribution shape).
"""

from __future__ import annotations

import json
import os
from datetime import datetime
from typing import Dict, Optional

import numpy as np

from ..core.physics import energies as energy_fn

TITLE_SUFFIXES = ("ground truth", "predicted")


def _cap(arr: np.ndarray, max_items: int) -> list:
    flat = np.asarray(arr).reshape(-1)
    if flat.size > max_items:
        idx = np.linspace(0, flat.size - 1, max_items).astype(int)
        flat = flat[idx]
    return flat.tolist()


def write_feature_distributions(
    save_dir: str, loc, vel, max_items: int = 100_000
) -> None:
    """loc/vel: ``[2, S, T, N, 3]`` (gt, pred)."""
    ts = datetime.now().isoformat()
    data = {}
    for b, suffix in enumerate(TITLE_SUFFIXES):
        data[suffix] = {
            "timestamp": ts,
            "position": _cap(loc[b], max_items),
            "velocity": _cap(vel[b], max_items),
            "force": None,
        }
    with open(os.path.join(save_dir, "feature_distributions.json"), "w") as f:
        json.dump(data, f)


def write_difference_distributions(
    save_dir: str, loc, vel, step: int = 1, max_items: int = 100_000
) -> None:
    ts = datetime.now().isoformat()
    data = {}
    for b, suffix in enumerate(TITLE_SUFFIXES):
        data[suffix] = {
            "timestamp": ts,
            "position_difference": _cap(np.diff(loc[b], axis=1, n=step), max_items),
            "velocity_difference": _cap(np.diff(vel[b], axis=1, n=step), max_items),
        }
    with open(os.path.join(save_dir, "difference_distributions.json"), "w") as f:
        json.dump(data, f)


def write_momentum_statistics(save_dir: str, vel) -> Dict:
    """Per-sim time-mean of the total-momentum magnitude
    (``visualization_utils.py:961-998``; unit masses)."""
    ts = datetime.now().isoformat()
    data = {}
    for b, suffix in enumerate(TITLE_SUFFIXES):
        total = np.sum(vel[b], axis=2)  # [S, T, 3]
        scalar = np.sqrt(np.sum(total * total, axis=-1))  # [S, T]
        data[suffix] = {
            "timestamp": ts,
            "momentum_statistics": scalar.mean(axis=1).tolist(),
        }
    with open(os.path.join(save_dir, "momentum_statistics.json"), "w") as f:
        json.dump(data, f, indent=4)
    return data


def compute_per_sim_energies(loc, vel, G: float, softening: float) -> np.ndarray:
    """``[S, T, 3]`` (kinetic, potential, total) per sim/step, unit masses."""
    import jax.numpy as jnp

    loc = jnp.asarray(loc)
    vel = jnp.asarray(vel)
    mass = jnp.ones(loc.shape[:-1] + (1,), loc.dtype)
    ke, pe, te = energy_fn(loc, vel, mass, G, softening)  # [S, T] each
    return np.stack([np.asarray(ke), np.asarray(pe), np.asarray(te)], axis=-1)


def write_energy_statistics(
    save_dir: str, loc, vel, G: float, softening: float, plot: bool = False
) -> Dict:
    """Mean/std energy-vs-time curves over sims (``:1005-1090``)."""
    ts = datetime.now().isoformat()
    labels = ["Kinetic Energy", "Potential Energy", "Total Energy"]
    data = {}
    arrays = {}
    for b, suffix in enumerate(TITLE_SUFFIXES):
        e = compute_per_sim_energies(loc[b], vel[b], G, softening)  # [S,T,3]
        arrays[suffix] = e
        stats = []
        times = list(range(e.shape[1]))
        for i, label in enumerate(labels):
            stats.append(
                {
                    "time": times,
                    "mean": e[:, :, i].mean(axis=0).tolist(),
                    "std_dev": e[:, :, i].std(axis=0).tolist(),
                    "label": label,
                }
            )
        data[suffix] = {"timestamp": ts, "data": stats}
    with open(os.path.join(save_dir, "energy_statistics.json"), "w") as f:
        json.dump(data, f, indent=4)

    if plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axs = plt.subplots(2, 1, figsize=(12, 12), sharex=True)
        colors = ["red", "blue", "green"]
        for ax, suffix in zip(axs, TITLE_SUFFIXES):
            e = arrays[suffix]
            for i, (label, color) in enumerate(zip(labels, colors)):
                mean = e[:, :, i].mean(axis=0)
                std = e[:, :, i].std(axis=0)
                t = np.arange(len(mean))
                ax.plot(t, mean, color=color, label=label)
                ax.fill_between(t, mean - std, mean + std, color=color, alpha=0.2)
            ax.set_title(suffix.title())
            ax.legend()
        fig.tight_layout()
        fig.savefig(os.path.join(save_dir, "energy_statistics.png"))
        plt.close(fig)
    return data


def write_all_extended(
    save_dir: str,
    loc_actual,
    vel_actual,
    loc_pred,
    vel_pred,
    G: float = 2.0,
    softening: float = 0.2,
    plot: bool = False,
    max_items: int = 100_000,
) -> None:
    os.makedirs(save_dir, exist_ok=True)
    loc = np.stack([np.asarray(loc_actual), np.asarray(loc_pred)], axis=0)
    vel = np.stack([np.asarray(vel_actual), np.asarray(vel_pred)], axis=0)
    write_feature_distributions(save_dir, loc, vel, max_items)
    write_difference_distributions(save_dir, loc, vel, max_items=max_items)
    write_momentum_statistics(save_dir, vel)
    write_energy_statistics(save_dir, loc, vel, G, softening, plot=plot)
    if plot:
        from ..viz.macro_plots import plot_extended_multiplots

        energy_arrays = {
            sfx: compute_per_sim_energies(loc[b], vel[b], G, softening)
            for b, sfx in enumerate(TITLE_SUFFIXES)
        }
        plot_extended_multiplots(save_dir, loc, vel, energy_arrays)
