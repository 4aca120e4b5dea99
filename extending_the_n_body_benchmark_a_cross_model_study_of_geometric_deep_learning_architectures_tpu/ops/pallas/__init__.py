"""Pallas TPU kernels for the hot dense-pairwise paths."""

from .gravity import pallas_acceleration, acceleration_auto  # noqa: F401
