"""Visualization outputs: plots, HTML, animations, PDFs exist and are valid."""

import os

import numpy as np

from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.viz import (
    macro_plots,
    trajectories,
)


def _walk(seed=0, S=3, T=40, N=4):
    rng = np.random.default_rng(seed)
    loc = rng.normal(size=(S, 1, N, 3)).cumsum(axis=1) + rng.normal(
        size=(S, T, N, 3)
    ).cumsum(axis=1) * 0.1
    return loc


def test_macro_histograms_and_pvalue_plot(tmp_path):
    gt = {"sticking_histogram": np.array([1.0, 2, 3]), "leaving_count": np.array([0.0, 1])}
    pred = {"sticking_histogram": np.array([1.0, 1, 4]), "leaving_count": np.array([1.0, 1])}
    macro_plots.plot_macro_histograms(str(tmp_path), gt, pred)
    assert (tmp_path / "sticking_distribution.png").exists()
    assert (tmp_path / "leaving_distribution.png").exists()
    macro_plots.plot_pvalue_series(
        str(tmp_path), [10, 20], [0.1, 0.5], {"energy_total": [0.2, 0.3]}
    )
    assert (tmp_path / "combined_pvalues.png").exists()


def test_trajectory_outputs(tmp_path):
    loc = _walk()
    p = trajectories.plot_trajectories_3d(str(tmp_path), loc)
    assert os.path.exists(p)
    html = trajectories.interactive_trajectory_html(str(tmp_path), loc, loc + 0.1)
    content = open(html).read()
    assert "canvas" in content and "ground truth" in content
    gif = trajectories.animate_trajectory(str(tmp_path), loc, max_frames=10, filename="t.mp4")
    assert os.path.exists(gif)  # mp4 or gif fallback


def test_checkpoint_pdf(tmp_path):
    ck = tmp_path / "checkpoints" / "10"
    ck.mkdir(parents=True)
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    ax.plot([1, 2])
    fig.savefig(ck / "sticking_distribution.png")
    plt.close(fig)
    out = trajectories.aggregate_checkpoint_plots_pdf(str(tmp_path))
    assert out is not None and os.path.exists(out)


def test_extended_multiplots(tmp_path):
    """The 6 non-macro multiplot PNGs of plot_macros (plot_macros.py:39-50)."""
    loc = np.stack([_walk(0), _walk(1)])  # [2, S, T, N, 3]
    vel = np.diff(loc, axis=2, prepend=loc[:, :, :1])
    energies = {
        s: np.random.default_rng(i).normal(size=(3, 40, 3))
        for i, s in enumerate(("ground truth", "predicted"))
    }
    macro_plots.plot_extended_multiplots(str(tmp_path), loc, vel, energies)
    for f in [
        "feature_distributions.png",
        "difference_distributions.png",
        "momentum_statistics_multiplot.png",
        "energies_of_all_sims.png",
        "energy_distributions_across_all_sims.png",
    ]:
        assert (tmp_path / f).exists(), f


def test_multi_model_overlay(tmp_path):
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.evaluation.ks_checkpoints import (
        _plot_multi_model,
    )

    series = {
        "a": [{"checkpoint": 10, "combined_pvalue": 0.1}, {"checkpoint": 20, "combined_pvalue": 0.5}],
        "b": [{"checkpoint": 10, "combined_pvalue": 1e-10}],
    }
    out = tmp_path / "sub" / "overlay_multi.png"
    _plot_multi_model(series, str(out))
    assert out.exists()
