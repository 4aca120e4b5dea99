"""Every registered model must be rollable inside the lax.scan rollout."""

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
    MODEL_REGISTRY,
    create_model,
)
from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.rollout import (
    make_rollout_fn,
)

pytestmark = pytest.mark.slow  # model-family compiles: excluded from the core tier

TINY = {
    "egnn_mc": dict(num_layers=1, hidden_node_dim=16, hidden_edge_dim=16, hidden_coord_dim=16),
    "painn": dict(num_layers=1, hidden_features=16, num_rbf=8),
    "graph_transformer": dict(num_layers=1, hidden_features=16, num_heads=2, dim_feedforward=32),
    "segnn": dict(num_layers=1, hidden_features=16),
    "seconv": dict(num_layers=1, hidden_features=16),
    "ponita": dict(num_layers=1, hidden_features=16, num_ori=6, basis_dim=16),
    "cgenn": dict(num_layers=1, hidden_features=8),
    "gmn": dict(num_layers=1, hidden_features=16),
    "equiformer_v2": dict(num_layers=1, sphere_channels=8, attn_hidden_channels=8,
                          num_heads=2, attn_alpha_channels=4, attn_value_channels=4,
                          ffn_hidden_channels=8, edge_channels=8),
}


@pytest.mark.parametrize("name", sorted(TINY))
def test_rollout_scan_compatible(name):
    assert name in MODEL_REGISTRY
    B, N = 2, 5
    pos = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3), jnp.float32)
    scene0 = Scene(
        pos=pos,
        vel=jax.random.normal(jax.random.PRNGKey(1), (B, N, 3), jnp.float32) * 0.1,
        force=jnp.zeros_like(pos),
        mass=jnp.ones((B, N, 1), jnp.float32),
    )
    model = create_model(name, **TINY[name])
    params = jax.jit(model.init)(jax.random.PRNGKey(2), scene0, G.knn_mask(pos, N - 1))
    fn = make_rollout_fn(model, num_steps=5)
    loc, vel, survived = fn(params, scene0)
    assert loc.shape == (B, 5, N, 3)
    assert np.isfinite(np.asarray(loc)).all()
    np.testing.assert_allclose(np.asarray(loc[:, 0]), np.asarray(pos), rtol=1e-6)
