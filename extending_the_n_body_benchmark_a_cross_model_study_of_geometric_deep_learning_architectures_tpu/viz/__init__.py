"""Plotting: macro histograms, trajectories, p-value curves (matplotlib)."""

from .macro_plots import plot_macro_histograms  # noqa: F401
