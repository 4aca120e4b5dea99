"""Approximately-uniform S2 orientation grids for PONITA.

The reference builds its fiber grid by Coulomb-repulsion optimization over
spherical angles (``models/ponita/geometry/rotation.py:946`` +
``repulsion.py:31-90``, 200 SGD steps on inverse-square energy).  Here the
same energy is minimized with plain NumPy projected gradient descent from a
Fibonacci-sphere start — deterministic, host-side, cached at import; the
result is an equally-uniform grid (the network only needs near-uniform
coverage, the exact point set is arbitrary up to rotation).
"""

from __future__ import annotations

import functools

import numpy as np


def fibonacci_sphere(n: int) -> np.ndarray:
    i = np.arange(n, dtype=np.float64)
    phi = np.pi * (3.0 - np.sqrt(5.0)) * i
    z = 1.0 - 2.0 * (i + 0.5) / n
    r = np.sqrt(np.clip(1.0 - z * z, 0.0, 1.0))
    pts = np.stack([r * np.cos(phi), r * np.sin(phi), z], axis=-1)
    return pts


@functools.lru_cache(maxsize=None)
def uniform_grid_s2(n: int, steps: int = 200, step_size: float = 0.01) -> np.ndarray:
    """``[n, 3]`` unit vectors minimizing pairwise Coulomb energy."""
    if n <= 0:
        raise ValueError("num_ori must be positive")
    if n == 1:
        return np.array([[0.0, 0.0, 1.0]])
    x = fibonacci_sphere(n)
    for _ in range(steps):
        diff = x[:, None, :] - x[None, :, :]
        d2 = np.sum(diff * diff, axis=-1) + np.eye(n)
        # Coulomb force ~ diff / d^3
        force = np.sum(diff / (d2[..., None] ** 1.5), axis=1)
        # project to the tangent plane and step
        force -= np.sum(force * x, axis=-1, keepdims=True) * x
        x = x + step_size * force
        x /= np.linalg.norm(x, axis=-1, keepdims=True)
    return x
