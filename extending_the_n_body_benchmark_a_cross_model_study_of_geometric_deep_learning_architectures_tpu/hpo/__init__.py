"""Hyper-parameter optimisation with param-budget matching."""

from .hpo import run_study, suggest_trial, adjust_width_to_target  # noqa: F401
