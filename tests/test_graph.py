"""Dense graph ops: KNN mask vs brute force, masked reductions, RBF/cutoffs."""

import jax
import jax.numpy as jnp
import numpy as np

from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.core import (
    graph as G,
)


def brute_force_knn(pos, k):
    """Reference semantics: per node, the k nearest non-self nodes
    (``build_graph_with_knn``, topk(largest=False)[1:])."""
    B, N, _ = pos.shape
    mask = np.zeros((B, N, N), dtype=bool)
    for b in range(B):
        d = np.linalg.norm(pos[b][:, None] - pos[b][None, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        for i in range(N):
            nbrs = np.argsort(d[i], kind="stable")[:k]
            mask[b, i, nbrs] = True
    return mask


def test_knn_mask_matches_brute_force():
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(3, 8, 3))
    for k in (1, 3, 7):
        got = np.asarray(G.knn_mask(jnp.asarray(pos), k))
        want = brute_force_knn(pos, k)
        np.testing.assert_array_equal(got, want)


def test_fully_connected_fast_path():
    pos = jnp.asarray(np.random.default_rng(1).normal(size=(2, 5, 3)))
    m = np.asarray(G.knn_mask(pos, 4))
    assert m.sum() == 2 * 5 * 4
    assert not m[np.arange(2)[:, None], np.arange(5), np.arange(5)].any()


def test_masked_segment_mean_matches_scatter_semantics():
    rng = np.random.default_rng(2)
    vals = rng.normal(size=(2, 4, 4, 3))
    mask = rng.random((2, 4, 4)) > 0.5
    got = np.asarray(G.masked_segment_mean(jnp.asarray(vals), jnp.asarray(mask)))
    for b in range(2):
        for i in range(4):
            js = np.where(mask[b, i])[0]
            want = vals[b, i, js].sum(0) / max(len(js), 1)
            np.testing.assert_allclose(got[b, i], want, rtol=1e-6)


def test_gaussian_rbf_and_cutoffs():
    d = jnp.asarray([0.0, 1.0, 5.0, 9.9, 10.0, 12.0])
    rbf = np.asarray(G.gaussian_rbf(d, 64, 10.0))
    assert rbf.shape == (6, 64)
    # first basis centred at 0 -> value 1 at d=0
    assert np.isclose(rbf[0, 0], 1.0)
    cut = np.asarray(G.cosine_cutoff(d, 10.0))
    assert np.isclose(cut[0], 1.0) and cut[-2] == 0.0 and cut[-1] == 0.0
    poly = np.asarray(G.polynomial_cutoff(d, 10.0))
    assert np.isclose(poly[0], 1.0) and poly[-1] == 0.0


def test_safe_ops_have_finite_grads_at_zero():
    def f(x):
        u, n = G.safe_unit(x)
        return jnp.sum(u) + jnp.sum(n) + jnp.sum(G.safe_sqrt(jnp.sum(x * x)))

    g = jax.grad(f)(jnp.zeros((3, 3)))
    assert bool(jnp.isfinite(g).all())


def test_rel_positions_orientation():
    pos = jnp.asarray(np.random.default_rng(3).normal(size=(1, 4, 3)))
    rel = np.asarray(G.rel_positions(pos))
    np.testing.assert_allclose(
        rel[0, 1, 2], np.asarray(pos)[0, 1] - np.asarray(pos)[0, 2], rtol=1e-7
    )
