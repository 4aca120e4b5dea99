"""GMN model: compositions, equivariance, SEGNN instance norm option."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.core import (
    graph as G,
)
from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.core.scene import (
    Scene,
)
from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.models import (
    create_model,
)

pytestmark = pytest.mark.slow  # model-family compiles: excluded from the core tier


def make_scene(N, seed=0):
    k = jax.random.PRNGKey(seed)
    pos = jax.random.normal(k, (2, N, 3), jnp.float32)
    vel = jax.random.normal(jax.random.PRNGKey(seed + 1), (2, N, 3), jnp.float32)
    charge = jnp.where(
        jax.random.bernoulli(jax.random.PRNGKey(seed + 2), 0.5, (2, N, 1)), 1.0, -1.0
    )
    return Scene(pos=pos, vel=vel, force=jnp.zeros_like(pos),
                 mass=jnp.ones((2, N, 1), jnp.float32), charge=charge)


@pytest.mark.parametrize("iso,st,hi", [(5, 0, 0), (1, 2, 0), (0, 0, 2)])
def test_gmn_compositions(iso, st, hi):
    N = iso + 2 * st + 3 * hi
    scene = make_scene(N)
    mask = G.knn_mask(scene.pos, N - 1)
    m = create_model("gmn", hidden_features=16, num_layers=2,
                     n_isolated=iso, n_stick=st, n_hinge=hi)
    params = m.init(jax.random.PRNGKey(3), scene, mask)
    out = m.apply(params, scene, mask)
    assert out.shape == (2, N, 6)
    assert bool(jnp.isfinite(out).all())


def test_gmn_rotation_equivariance():
    scene = make_scene(5, seed=5)
    mask = G.knn_mask(scene.pos, 4)
    m = create_model("gmn", hidden_features=16, num_layers=2)
    params = m.init(jax.random.PRNGKey(0), scene, mask)
    out = m.apply(params, scene, mask)

    A = np.random.default_rng(1).normal(size=(3, 3))
    Q, r = np.linalg.qr(A)
    R = jnp.asarray(Q * np.sign(np.diag(r)), jnp.float32)
    scene_r = Scene(pos=scene.pos @ R.T, vel=scene.vel @ R.T,
                    force=scene.force @ R.T, mass=scene.mass, charge=scene.charge)
    out_r = m.apply(params, scene_r, G.knn_mask(scene_r.pos, 4))
    want = jnp.concatenate([out[..., :3] @ R.T, out[..., 3:] @ R.T], axis=-1)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(want), atol=2e-4)


def test_gmn_stick_preserves_length():
    """The stick update is a rigid rotation: pairwise distance conserved."""
    scene = make_scene(4, seed=7)
    mask = G.knn_mask(scene.pos, 3)
    m = create_model("gmn", hidden_features=16, num_layers=3,
                     n_isolated=0, n_stick=2, n_hinge=0)
    params = m.init(jax.random.PRNGKey(0), scene, mask)
    out = m.apply(params, scene, mask)
    new_pos = scene.pos + out[..., :3]
    for a, b in [(0, 1), (2, 3)]:
        d0 = jnp.linalg.norm(scene.pos[:, a] - scene.pos[:, b], axis=-1)
        d1 = jnp.linalg.norm(new_pos[:, a] - new_pos[:, b], axis=-1)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), rtol=1e-4)


def test_segnn_instance_norm_option():
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.ops.steerable import (
        Irreps,
        SteerableInstanceNorm,
    )

    scene = make_scene(5, seed=9)
    mask = G.knn_mask(scene.pos, 4)
    m = create_model("segnn", num_layers=2, hidden_features=16,
                     normalization_type="instance", center_mode="nodes")
    params = jax.jit(m.init)(jax.random.PRNGKey(0), scene, mask)
    out = jax.jit(m.apply)(params, scene, mask)
    assert bool(jnp.isfinite(out).all())

    # norm unit behavior: output scalar channels are centred per graph
    ir = Irreps("4x0e+2x1o")
    norm = SteerableInstanceNorm(ir)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 7, ir.dim)) * 5 + 2
    p = norm.init(jax.random.PRNGKey(2), x)
    y = norm.apply(p, x)
    np.testing.assert_allclose(np.asarray(jnp.mean(y[..., :4], axis=1)), 0, atol=1e-5)


def test_gmn_tanh_coords_range_declared_not_applied():
    """The reference declares coords_range when tanh=True (GMN.py:137) but
    its coord_model never multiplies by it (GMN.py:172-178): the parameter
    must exist (param-count parity) yet have no effect on the output."""
    scene = make_scene(5, seed=2)
    mask = G.knn_mask(scene.pos, 4)
    m = create_model("gmn", hidden_features=16, num_layers=2, tanh=True)
    params = m.init(jax.random.PRNGKey(0), scene, mask)
    flat = jax.tree_util.tree_leaves_with_path(params)
    assert any("coords_range" in jax.tree_util.keystr(kp) for kp, _ in flat)
    out = m.apply(params, scene, mask)

    big = jax.tree_util.tree_map_with_path(
        lambda kp, x: x * 100.0 if "coords_range" in jax.tree_util.keystr(kp) else x,
        params,
    )
    out_big = m.apply(big, scene, mask)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_big))
