"""Edge-aligned SO(3) frames and batched Wigner-D matrices for EquiformerV2.

The reference computes per-edge rotation matrices that align each edge with
the SH zonal axis (``architecture/edge_rot_mat.py``) and converts them to
Wigner-D matrices via precomputed ``Jd.pt`` tables + Euler angles
(``architecture/wigner.py:16-40``, ``so3.py:469-531``).  Here:

* the frame is built jit-side from the unit edge vector with a deterministic
  (instead of random) azimuth pick — eSCN's SO(2) structure makes the model
  exactly invariant to this gauge choice, which is why the reference can use
  ``torch.rand_like`` there;
* D^1 is a basis-permuted copy of R; D^2 is *exactly quadratic* in R, so a
  constant ``[5, 5, 9, 9]`` tensor (solved once on host against the
  numerically-derived Wigner matrices of :mod:`.steerable`) evaluates it as
  one einsum — no Euler angles, no host sync, fully batched.

Coefficient layout (lmax=2): l-primary, e3nn real basis per l
(m = -l..l; l=1 components are (y, z, x) of the physical vector).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .steerable import wigner_D_numpy

# physical (x,y,z) -> basis (y,z,x) row selection for l=1
_YZX = np.array([1, 2, 0])


@functools.lru_cache(maxsize=None)
def _wigner2_quadratic_tensor() -> np.ndarray:
    """Solve T with ``D2(R)[a,b] = sum_pq T[a,b,p,q] vecR[p] vecR[q]``."""
    rng = np.random.default_rng(7)
    rows = []
    targets = []
    for _ in range(60):
        A = rng.normal(size=(3, 3))
        Q, r = np.linalg.qr(A)
        R = Q * np.sign(np.diag(r))
        if np.linalg.det(R) < 0:
            R[:, 0] *= -1
        v = R.reshape(9)
        rows.append(np.outer(v, v).reshape(81))
        targets.append(wigner_D_numpy(2, R).reshape(25))
    M = np.stack(rows)  # [60, 81]
    Y = np.stack(targets)  # [60, 25]
    T, *_ = np.linalg.lstsq(M, Y, rcond=None)  # [81, 25]
    T = T.T.reshape(5, 5, 9, 9)
    # verify on a held-out rotation
    A = rng.normal(size=(3, 3))
    Q, r = np.linalg.qr(A)
    R = Q * np.sign(np.diag(r))
    if np.linalg.det(R) < 0:
        R[:, 0] *= -1
    v = R.reshape(9)
    err = np.abs(np.einsum("abpq,p,q->ab", T, v, v) - wigner_D_numpy(2, R)).max()
    assert err < 1e-8, f"Wigner-2 quadratic fit failed: {err}"
    return T


def edge_align_rotation(edge_vec: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Rotation ``R`` with ``R @ unit(edge_vec) = z_hat`` for every edge.

    edge_vec ``[..., 3]`` -> ``[..., 3, 3]``.  Azimuth gauge: the coordinate
    axis least aligned with the edge (deterministic; the reference uses a
    random vector, ``edge_rot_mat.py:22-44`` — the SO(2) construction is
    gauge invariant either way).  Gradients are stopped like the reference's
    ``.detach()``.
    """
    v = jax.lax.stop_gradient(edge_vec)
    n = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    e = v / jnp.where(n > eps, n, 1.0)
    # pick helper axis with smallest |e_k|
    abs_e = jnp.abs(e)
    helper = jax.nn.one_hot(jnp.argmin(abs_e, axis=-1), 3, dtype=e.dtype)
    b1 = jnp.cross(e, helper)
    b1 = b1 / jnp.sqrt(jnp.sum(b1 * b1, axis=-1, keepdims=True) + eps)
    b2 = jnp.cross(e, b1)
    # rows (b1, b2, e): R @ e = (0, 0, 1)
    return jnp.stack([b1, b2, e], axis=-2)


def wigner_blocks(R: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(D0, D1, D2) for a batch of rotation matrices ``R [..., 3, 3]``."""
    d0 = jnp.ones(R.shape[:-2] + (1, 1), R.dtype)
    idx = jnp.asarray(_YZX)
    d1 = R[..., idx[:, None], idx[None, :]]
    T = jnp.asarray(_wigner2_quadratic_tensor(), R.dtype)
    vec = R.reshape(R.shape[:-2] + (9,))
    d2 = jnp.einsum("abpq,...p,...q->...ab", T, vec, vec)
    return d0, d1, d2


def wigner_full(R: jnp.ndarray, lmax: int = 2) -> jnp.ndarray:
    """Block-diagonal D over l=0..lmax in l-primary layout: ``[..., K, K]``
    with ``K = (lmax+1)^2``."""
    d0, d1, d2 = wigner_blocks(R)
    K = (lmax + 1) ** 2
    D = jnp.zeros(R.shape[:-2] + (K, K), R.dtype)
    D = D.at[..., 0:1, 0:1].set(d0)
    if lmax >= 1:
        D = D.at[..., 1:4, 1:4].set(d1)
    if lmax >= 2:
        D = D.at[..., 4:9, 4:9].set(d2)
    return D


# ---------------------------------------------------------------- layouts

def lprimary_pairs(lmax: int):
    return [(l, m) for l in range(lmax + 1) for m in range(-l, l + 1)]


@functools.lru_cache(maxsize=None)
def restricted_indices(lmax: int, mmax: int) -> np.ndarray:
    """l-primary indices of coefficients with ``|m| <= mmax``."""
    return np.array(
        [i for i, (l, m) in enumerate(lprimary_pairs(lmax)) if abs(m) <= mmax]
    )


@functools.lru_cache(maxsize=None)
def m_order_indices(lmax: int, mmax: int):
    """Index arrays (into the restricted layout) for the SO(2) blocks.

    Returns ``(m0, [(minus_m, plus_m) for m in 1..mmax])`` — the reference's
    ``CoefficientMappingModule`` m-primary regrouping (``so3.py``).
    """
    pairs = [(l, m) for (l, m) in lprimary_pairs(lmax) if abs(m) <= mmax]
    index = {p: i for i, p in enumerate(pairs)}
    m0 = np.array([index[(l, 0)] for l in range(lmax + 1)])
    blocks = []
    for m in range(1, mmax + 1):
        minus = np.array([index[(l, -m)] for l in range(m, lmax + 1)])
        plus = np.array([index[(l, m)] for l in range(m, lmax + 1)])
        blocks.append((minus, plus))
    return m0, blocks


@functools.lru_cache(maxsize=None)
def l_expand_index(lmax: int, mmax: int | None = None) -> np.ndarray:
    """Map each (restricted) coefficient to its degree l — used to expand
    per-l weights across m (``SO3_LinearV2``, ``so3.py:715-720``)."""
    pairs = lprimary_pairs(lmax)
    if mmax is not None:
        pairs = [(l, m) for (l, m) in pairs if abs(m) <= mmax]
    return np.array([l for (l, m) in pairs])


# ---------------------------------------------------------------- S2 grid

@functools.lru_cache(maxsize=None)
def s2_grid_mats(lmax: int, mmax: int, resolution: int = 18):
    """(to_grid [G, K_r], from_grid [K_r, G]) for the restricted basis.

    Grid: Gauss-Legendre colatitudes x uniform azimuths; to_grid evaluates
    component-normalised real SH (e3nn basis) at the grid points; from_grid
    is the quadrature-weighted adjoint (exact for band-limited signals).
    Role of the reference ``SO3_Grid`` (``so3.py``), rebuilt from scratch.
    """
    from .steerable import _sh_numpy

    nlat = resolution
    nlon = 2 * resolution
    x_gl, w_gl = np.polynomial.legendre.leggauss(nlat)  # cos(theta) nodes
    theta = np.arccos(x_gl)
    phi = np.linspace(0, 2 * np.pi, nlon, endpoint=False)
    tt, pp = np.meshgrid(theta, phi, indexing="ij")
    pts = np.stack(
        [np.sin(tt) * np.cos(pp), np.sin(tt) * np.sin(pp), np.cos(tt)], axis=-1
    ).reshape(-1, 3)
    w = np.repeat(w_gl, nlon) * (2 * np.pi / nlon)  # total 4*pi

    idx = restricted_indices(lmax, mmax)
    comps = np.concatenate([_sh_numpy(l, pts) for l in range(lmax + 1)], axis=-1)
    comps = comps * np.sqrt(4 * np.pi)  # integral -> component normalization
    A = comps[:, idx]  # [G, K_r]
    from_grid = (A * w[:, None]).T / (4 * np.pi)  # adjoint with quadrature
    return A, from_grid
