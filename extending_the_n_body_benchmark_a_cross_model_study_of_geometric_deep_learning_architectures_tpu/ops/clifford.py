"""Clifford algebra Cl(3) tables for CGENN — host-side NumPy, used as jit
constants.

Re-derivation of the reference's ``models/CGENN/algebra/`` (shortlex blade
order, canonical-reordering signs, geometric multiplication table) without
torch.  For Cl(3) the 8 blades in shortlex order are
``[1, e1, e2, e3, e12, e13, e23, e123]`` with grades ``[0,1,1,1,2,2,2,3]``.
The geometric product is then one ``[8, 8, 8]`` einsum — ideal for the MXU
(SURVEY.md §7 model (g)).
"""

from __future__ import annotations

import functools
import itertools
from typing import List, Sequence, Tuple

import numpy as np

DIM = 3
N_BLADES = 8
GRADES = np.array([0, 1, 1, 1, 2, 2, 2, 3])
SUBSPACES = np.array([1, 3, 3, 1])  # C(3,g)
GRADE_SLICES = [slice(0, 1), slice(1, 4), slice(4, 7), slice(7, 8)]
BETA_SIGNS = ((-1) ** (GRADES * (GRADES - 1) // 2)).astype(np.float64)


def _blade_bitmaps() -> List[int]:
    bitmaps = []
    for r in range(DIM + 1):
        for combo in itertools.combinations(range(DIM), r):
            bm = 0
            for i in combo:
                bm |= 1 << i
            bitmaps.append(bm)
    return bitmaps


_BITMAPS = _blade_bitmaps()
_BITMAP_TO_INDEX = {bm: i for i, bm in enumerate(_BITMAPS)}


def _reorder_sign(a: int, b: int) -> int:
    """Sign from reordering basis vectors of blade ``a`` past blade ``b``
    (Euclidean part, ``metric.py:canonical_reordering_sign_euclidean``)."""
    a >>= 1
    s = 0
    while a:
        s += bin(a & b).count("1")
        a >>= 1
    return 1 if s % 2 == 0 else -1


def cayley_table(signature: Sequence[float]) -> np.ndarray:
    """Geometric multiplication table ``C[i, j, k]``: ``(e_i e_k)_j``,
    i.e. left blade i, output blade j, right blade k — so the product is
    ``einsum('...i,ijk,...k->...j', a, C, b)`` like the reference
    (``cliffordalgebra.py:58-69``).

    ``signature`` are the squared norms of the 3 generators (the reference
    passes the eigenvalues of its learnable symmetric metric,
    ``nbody_cgenn.py:267-273`` / ``norms.py:cayley``).
    """
    sig = np.asarray(signature, dtype=np.float64)
    C = np.zeros((N_BLADES, N_BLADES, N_BLADES))
    for i, bm_a in enumerate(_BITMAPS):
        for k, bm_b in enumerate(_BITMAPS):
            sign = _reorder_sign(bm_a, bm_b)
            common = bm_a & bm_b
            val = float(sign)
            g = 0
            while common:
                if common & 1:
                    val *= sig[g]
                g += 1
                common >>= 1
            j = _BITMAP_TO_INDEX[bm_a ^ bm_b]
            C[i, j, k] += val
    return C


@functools.lru_cache(maxsize=None)
def geometric_product_paths() -> np.ndarray:
    """Bool ``[4, 4, 4]`` of grade triples with a nonzero product path
    (``CliffordAlgebra.geometric_product_paths``)."""
    C = cayley_table((1.0, 1.0, 1.0))
    paths = np.zeros((4, 4, 4), dtype=bool)  # (left, out, right) grade triples
    for g_l in range(4):
        for g_o in range(4):
            for g_r in range(4):
                block = C[GRADE_SLICES[g_l], GRADE_SLICES[g_o], GRADE_SLICES[g_r]]
                paths[g_l, g_o, g_r] = bool(np.abs(block).sum() > 0)
    return paths


def reference_metric(seed: int = 0) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """The frozen 'learnable' metric of ``nbody_cgenn.py:207-219``:
    ``0.5*I + 1e-4*rand(3,3)``, used symmetrised.  Returns
    ``(eigenvalues, P, P_inv)`` of the symmetrised metric — precomputed since
    the parameter never trains (SURVEY.md §7 hard part 5; the reference
    recomputes ``torch.linalg.eig`` every forward)."""
    rng = np.random.default_rng(seed)
    m = 0.5 * np.eye(3) + 1e-4 * rng.random((3, 3))
    sym = m + m.T
    w, P = np.linalg.eigh(sym)
    # eigh returns ascending eigenvalues; the reference's non-symmetric
    # ``eig`` ordering is arbitrary — any consistent basis works.
    return w, P, np.linalg.inv(P)


def embed_grade(x: np.ndarray, grade: int) -> np.ndarray:  # pragma: no cover
    """Zero-pad a ``[..., C(3,g)]`` tensor into full ``[..., 8]`` blades."""
    out = np.zeros(x.shape[:-1] + (N_BLADES,), x.dtype)
    out[..., GRADE_SLICES[grade]] = x
    return out
