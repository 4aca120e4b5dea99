"""Low-level ops: steerable CG/Wigner, Clifford tables, SO3 edge utilities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.ops import (
    clifford as cl,
    s2grid,
    so3_edge as SE,
    steerable as S,
)


def random_rotation(seed=0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(3, 3))
    Q, r = np.linalg.qr(A)
    R = Q * np.sign(np.diag(r))
    if np.linalg.det(R) < 0:
        R[:, 0] *= -1
    return R


def test_clebsch_gordan_equivariance():
    R = random_rotation(1)
    for l1 in range(3):
        for l2 in range(3):
            for l3 in range(abs(l1 - l2), min(l1 + l2, 2) + 1):
                C = S.clebsch_gordan(l1, l2, l3)
                D1, D2, D3 = (S.wigner_D_numpy(l, R) for l in (l1, l2, l3))
                lhs = np.einsum("ab,bij->aij", D3, C)
                rhs = np.einsum("kij,ia,jb->kab", C, D1, D2)
                np.testing.assert_allclose(lhs, rhs, atol=1e-12)
                assert np.isclose(np.linalg.norm(C), 1.0)


def test_spherical_harmonics_equivariance_and_norm():
    R = random_rotation(2)
    v = np.random.default_rng(0).normal(size=(20, 3))
    Y = np.asarray(S.spherical_harmonics(2, jnp.asarray(v)))
    Yr = np.asarray(S.spherical_harmonics(2, jnp.asarray(v @ R.T)))
    import scipy.linalg

    D = scipy.linalg.block_diag(*[S.wigner_D_numpy(l, R) for l in range(3)])
    np.testing.assert_allclose(Yr, Y @ D.T, atol=1e-5)
    # integral normalization: Y_00 = 1/sqrt(4 pi)
    assert np.allclose(Y[:, 0], 0.28209479)


def test_irreps_and_weight_balance():
    ir = S.Irreps("48x0e+48x1o")
    assert ir.dim == 192 and ir.num_irreps == 96
    assert S.weight_balanced_irreps(96, S.Irreps.spherical_harmonics(1), 1) == ir
    # TP weight count equals a 96x96 linear for the balanced irreps
    assert (
        S.tp_weight_numel(ir, S.Irreps.spherical_harmonics(1), ir) == 96 * 96
    )


def test_gate_irreps_structure():
    pre = S.gate_irreps(S.Irreps("48x0e+48x1o"))
    assert pre == S.Irreps("96x0e+48x1o")


def test_cayley_table_products():
    C = cl.cayley_table((1.0, 1.0, 1.0))
    e1 = np.zeros(8); e1[1] = 1
    e2 = np.zeros(8); e2[2] = 1
    prod = np.einsum("i,ijk,k->j", e1, C, e2)
    e12 = np.zeros(8); e12[4] = 1
    np.testing.assert_allclose(prod, e12)  # e1 e2 = e12
    # e1 e1 = signature
    prod11 = np.einsum("i,ijk,k->j", e1, C, e1)
    want = np.zeros(8); want[0] = 1.0
    np.testing.assert_allclose(prod11, want)
    # anticommute: e2 e1 = -e12
    prod21 = np.einsum("i,ijk,k->j", e2, C, e1)
    np.testing.assert_allclose(prod21, -e12)


def test_geometric_product_paths():
    paths = cl.geometric_product_paths()
    # grade-1 x grade-1 produces grades 0 and 2
    assert paths[1, 0, 1] and paths[1, 2, 1]
    assert not paths[1, 1, 1]  # vectors do not produce vectors
    assert not paths[0, 3, 0]  # scalar x scalar has no trivector part


def test_reference_metric_decomposition():
    w, P, P_inv = cl.reference_metric(0)
    sym = P @ np.diag(w) @ P_inv
    assert np.allclose(sym, sym.T, atol=1e-10)
    assert np.allclose(w, 1.0, atol=1e-3)  # I + 1e-4 noise


def test_wigner_blocks_match_oracle():
    R = random_rotation(3)
    d0, d1, d2 = SE.wigner_blocks(jnp.asarray(R)[None])
    np.testing.assert_allclose(np.asarray(d1[0]), S.wigner_D_numpy(1, R), atol=1e-6)
    np.testing.assert_allclose(np.asarray(d2[0]), S.wigner_D_numpy(2, R), atol=1e-6)


def test_edge_alignment():
    v = np.random.default_rng(4).normal(size=(16, 3))
    Re = np.asarray(SE.edge_align_rotation(jnp.asarray(v)))
    e = v / np.linalg.norm(v, axis=-1, keepdims=True)
    np.testing.assert_allclose(
        np.einsum("eij,ej->ei", Re, e), np.tile([0, 0, 1.0], (16, 1)), atol=1e-5
    )
    np.testing.assert_allclose(
        np.einsum("eij,ekj->eik", Re, Re), np.tile(np.eye(3), (16, 1, 1)), atol=1e-5
    )
    det = np.linalg.det(Re)
    np.testing.assert_allclose(det, 1.0, atol=1e-5)


def test_s2_grid_roundtrip():
    for mmax in (1, 2):
        to_g, from_g = SE.s2_grid_mats(2, mmax)
        n = to_g.shape[1]
        np.testing.assert_allclose(from_g @ to_g, np.eye(n), atol=1e-10)


def test_s2_repulsion_grid_uniformity():
    g = s2grid.uniform_grid_s2(20)
    assert g.shape == (20, 3)
    np.testing.assert_allclose(np.linalg.norm(g, axis=-1), 1.0, atol=1e-9)
    # min pairwise angle should be reasonably large for a uniform grid
    dots = g @ g.T - 2 * np.eye(20)
    max_cos = dots.max()
    assert max_cos < 0.9  # no two directions closer than ~25 degrees
