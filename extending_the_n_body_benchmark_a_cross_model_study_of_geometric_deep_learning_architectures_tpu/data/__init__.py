"""Datasets: on-the-fly gravity trajectories (device-resident) and helpers."""

from .gravity_otf import GravityDatasetOtf  # noqa: F401
