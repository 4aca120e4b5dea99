"""Model correctness: shapes, finiteness of values *and* gradients,
E(3)/permutation equivariance where the architecture promises it."""

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

pytestmark = pytest.mark.slow  # model-family compiles: excluded from the core tier

TINY = {
    "egnn_mc": dict(num_layers=2, hidden_node_dim=16, hidden_edge_dim=16, hidden_coord_dim=16),
    "painn": dict(num_layers=2, hidden_features=16, num_rbf=8),
    "graph_transformer": dict(num_layers=2, hidden_features=16, num_heads=2, dim_feedforward=32),
    # center_mode="nodes" for exact rotation equivariance (the reference's
    # default subtracts a per-node coordinate mean, segnn.py docstring)
    "segnn": dict(num_layers=2, hidden_features=16, center_mode="nodes"),
    "ponita": dict(num_layers=2, hidden_features=16, num_ori=6),
    "cgenn": dict(num_layers=2, hidden_features=8),
    "equiformer_v2": dict(num_layers=1, sphere_channels=8, attn_hidden_channels=8,
                          num_heads=2, attn_alpha_channels=4, attn_value_channels=4,
                          ffn_hidden_channels=8, edge_channels=8, num_distance_basis=8),
}

# egnn_mc is intentionally absent: the reference's plain-MLP vector heads
# (egnn_mc.py:189-208) break exact rotation equivariance.  ponita is only
# approximately equivariant (S2 grid discretization) -> loose tolerance.
EQUIVARIANT = {"painn", "segnn", "ponita", "cgenn", "equiformer_v2"}
EQUIV_ATOL = {"ponita": 5e-2}
# equiformer_v2's reference velocity lift (nn.Linear(3,3C)+bias) is not
# equivariant; the rotation test uses the equivariant embedding mode to
# verify the SO(3)/SO(2) machinery itself.
EQUIV_EXTRA = {"equiformer_v2": {"equivariant_embedding": True}}


def make_scene(key, B=2, N=5, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    pos = jax.random.normal(k1, (B, N, 3), dtype)
    vel = jax.random.normal(k2, (B, N, 3), dtype)
    return Scene(pos=pos, vel=vel, force=jnp.zeros_like(pos), mass=jnp.ones((B, N, 1), dtype))


def registered_models():
    return [m for m in TINY if m in MODEL_REGISTRY]


@pytest.mark.parametrize("name", registered_models())
def test_forward_shape_and_finite(name):
    scene = make_scene(jax.random.PRNGKey(0))
    mask = G.knn_mask(scene.pos, 4)
    model = create_model(name, **TINY[name])
    params = model.init(jax.random.PRNGKey(1), scene, mask)
    out = model.apply(params, scene, mask)
    assert out.shape == (2, 5, 6)
    assert bool(jnp.isfinite(out).all())


@pytest.mark.parametrize("name", registered_models())
def test_grads_finite(name):
    scene = make_scene(jax.random.PRNGKey(2))
    mask = G.knn_mask(scene.pos, 4)
    model = create_model(name, **TINY[name])
    params = model.init(jax.random.PRNGKey(3), scene, mask)
    y = jax.random.normal(jax.random.PRNGKey(4), (2, 5, 6))

    def loss(p):
        pred = model.apply(p, scene, mask, train=True, rngs={"dropout": jax.random.PRNGKey(5)})
        return jnp.mean((pred - y.astype(pred.dtype)) ** 2)

    grads = jax.grad(loss)(params)
    assert all(bool(jnp.isfinite(g).all()) for g in jax.tree_util.tree_leaves(grads))


def random_rotation(key):
    a = jax.random.normal(key, (3, 3))
    q, r = jnp.linalg.qr(a)
    return q * jnp.sign(jnp.diag(r))  # proper-ish orthogonal


@pytest.mark.parametrize("name", sorted(EQUIVARIANT))
def test_rotation_equivariance(name):
    """Rotating inputs rotates the two output 3-vectors: f(Rx) = R f(x)."""
    if name not in MODEL_REGISTRY:
        pytest.skip(f"{name} not yet implemented")
    scene = make_scene(jax.random.PRNGKey(6))
    mask = G.knn_mask(scene.pos, 4)
    model = create_model(name, **{**TINY[name], **EQUIV_EXTRA.get(name, {})})
    params = model.init(jax.random.PRNGKey(7), scene, mask)
    out = model.apply(params, scene, mask)

    R = random_rotation(jax.random.PRNGKey(8)).astype(scene.pos.dtype)
    scene_r = Scene(
        pos=scene.pos @ R.T, vel=scene.vel @ R.T, force=scene.force @ R.T, mass=scene.mass
    )
    out_r = model.apply(params, scene_r, G.knn_mask(scene_r.pos, 4))
    want = jnp.concatenate([out[..., :3] @ R.T, out[..., 3:] @ R.T], axis=-1)
    np.testing.assert_allclose(
        np.asarray(out_r), np.asarray(want), atol=EQUIV_ATOL.get(name, 2e-4)
    )


@pytest.mark.parametrize("name", registered_models())
def test_permutation_equivariance(name):
    """Permuting bodies permutes outputs identically (graph symmetry)."""
    scene = make_scene(jax.random.PRNGKey(9))
    model = create_model(name, **TINY[name])
    mask = G.knn_mask(scene.pos, 4)
    params = model.init(jax.random.PRNGKey(10), scene, mask)
    out = model.apply(params, scene, mask)

    perm = jnp.asarray([3, 1, 4, 0, 2])
    scene_p = Scene(
        pos=scene.pos[:, perm],
        vel=scene.vel[:, perm],
        force=scene.force[:, perm],
        mass=scene.mass[:, perm],
    )
    out_p = model.apply(params, scene_p, G.knn_mask(scene_p.pos, 4))
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out[:, perm]), atol=2e-4)


@pytest.mark.parametrize("name", ["egnn_mc", "painn"])
def test_translation_invariance_of_pos_dt(name):
    """pos_dt and vel outputs are translation invariant (relative geometry)."""
    scene = make_scene(jax.random.PRNGKey(11))
    mask = G.knn_mask(scene.pos, 4)
    model = create_model(name, **TINY[name])
    params = model.init(jax.random.PRNGKey(12), scene, mask)
    out = model.apply(params, scene, mask)
    shift = jnp.asarray([10.0, -5.0, 3.0], scene.pos.dtype)
    scene_t = Scene(pos=scene.pos + shift, vel=scene.vel, force=scene.force, mass=scene.mass)
    out_t = model.apply(params, scene_t, mask)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out), atol=1e-4)


def test_segnn_center_mode_coords_quirk():
    """Default 'coords' mode reproduces the reference's per-node coordinate
    mean subtraction (o3_building_blocks.py:274: pos.mean(1, keepdims=True))."""
    scene = make_scene(jax.random.PRNGKey(20))
    model = create_model("segnn", num_layers=1, hidden_features=16)  # default mode
    mask = G.knn_mask(scene.pos, 4)
    x, *_ = model.featurize(scene, mask)
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.models.segnn import (
        irrep1o_to_vec,
    )

    centered = irrep1o_to_vec(x[..., 0:3])
    want = scene.pos - jnp.mean(scene.pos, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(centered), np.asarray(want), rtol=1e-6)


def test_model_registry_create():
    m = create_model("egnn_mc", num_layers=3)
    assert m.num_layers == 3
    with pytest.raises(ValueError):
        create_model("not_a_model")


EQV2_OPTION_SETS = [
    dict(use_gate_act=True),
    dict(use_grid_mlp=True),
    dict(use_grid_mlp=True, use_sep_s2_act=False),
    dict(use_sep_s2_act=False),
    dict(use_m_share_rad=True),
    dict(use_attn_renorm=False),
]


@pytest.mark.parametrize(
    "opts", EQV2_OPTION_SETS, ids=lambda o: "+".join(sorted(k for k in o))
)

def test_equiformer_option_variants(opts):
    """The reference's architectural alternates (use_gate_act / use_grid_mlp /
    use_sep_s2_act / use_m_share_rad / use_attn_renorm,
    equiformer_v2_nbody.py:129-138) all produce finite outputs AND preserve
    rotation equivariance of the SO(3) machinery (with the equivariant
    velocity lift)."""
    scene = make_scene(jax.random.PRNGKey(30))
    mask = G.knn_mask(scene.pos, 4)
    model = create_model(
        "equiformer_v2", **{**TINY["equiformer_v2"], "equivariant_embedding": True, **opts}
    )
    params = model.init(jax.random.PRNGKey(31), scene, mask)
    out = model.apply(params, scene, mask)
    assert out.shape == (2, 5, 6)
    assert bool(jnp.isfinite(out).all())

    R = random_rotation(jax.random.PRNGKey(32)).astype(scene.pos.dtype)
    scene_r = Scene(
        pos=scene.pos @ R.T, vel=scene.vel @ R.T, force=scene.force @ R.T, mass=scene.mass
    )
    out_r = model.apply(params, scene_r, G.knn_mask(scene_r.pos, 4))
    want = jnp.concatenate([out[..., :3] @ R.T, out[..., 3:] @ R.T], axis=-1)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(want), atol=2e-4)


def test_equiformer_embeds_charges_when_present():
    """EquiformerV2's atom embeddings index scene.charge when the dataset
    provides it (the reference feeds the charges tensor as atomic_numbers,
    equiformer_v2_nbody.py:433); mass is only the gravity-scene stand-in."""
    kw = dict(TINY["equiformer_v2"])
    model = create_model("equiformer_v2", **kw)
    B, N = 2, 5
    k = jax.random.PRNGKey(0)
    pos = jax.random.normal(k, (B, N, 3), jnp.float32)
    base = Scene(pos=pos, vel=pos * 0.1, force=jnp.zeros_like(pos),
                 mass=jnp.ones((B, N, 1), jnp.float32))
    charged = Scene(pos=base.pos, vel=base.vel, force=base.force,
                    mass=base.mass,
                    charge=jnp.full((B, N, 1), 3.0, jnp.float32))
    mask = G.knn_mask(pos, N - 1)
    params = model.init(jax.random.PRNGKey(1), base, mask)
    out_mass = model.apply(params, base, mask)
    out_charge = model.apply(params, charged, mask)
    assert not np.allclose(np.asarray(out_mass), np.asarray(out_charge))


def test_egnn_mc_fc_fast_matches_masked_path():
    """fc_fast (mask-multiply-free FC aggregation) must be algebraically
    identical to the masked means for a fully-connected mask."""
    B, N = 3, 9
    pos = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3))
    vel = jax.random.normal(jax.random.PRNGKey(1), (B, N, 3)) * 0.1
    scene = Scene(pos=pos, vel=vel, force=jnp.zeros_like(pos),
                  mass=jnp.ones((B, N, 1)))
    mask = G.knn_mask(pos, N - 1)
    kw = TINY["egnn_mc"]
    m0 = create_model("egnn_mc", **kw)
    m1 = create_model("egnn_mc", **kw, fc_fast=True)
    p = m0.init(jax.random.PRNGKey(2), scene, mask)
    o0 = m0.apply(p, scene, mask)
    o1 = m1.apply(p, scene, mask)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1),
                               rtol=1e-6, atol=1e-6)


def test_equiformer_remat_matches_baseline():
    """``remat=True`` (jax.checkpoint on the scanned transformer block —
    the HBM knob that fits 10M-class shapes on one v5e chip) must share the
    param tree with the default path and reproduce its gradients bit-near:
    rematerialisation changes the backward schedule, never the math."""
    import jax.flatten_util

    scene = make_scene(jax.random.PRNGKey(40))
    mask = G.knn_mask(scene.pos, 4)
    kw = {**TINY["equiformer_v2"], "num_layers": 3}
    m0 = create_model("equiformer_v2", **kw)
    m1 = create_model("equiformer_v2", remat=True, **kw)
    params = m0.init(jax.random.PRNGKey(41), scene, mask)

    def loss(m):
        return lambda p: jnp.sum(m.apply(p, scene, mask) ** 2)

    g0, _ = jax.flatten_util.ravel_pytree(jax.grad(loss(m0))(params))
    g1, _ = jax.flatten_util.ravel_pytree(jax.grad(loss(m1))(params))
    # f32 reassociation in the recomputed forward wiggles the last ulps
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                               rtol=1e-4, atol=1e-5)
    # train-mode (static dropout branches) still compiles under the wrapper
    out = m1.apply(params, scene, mask, True,
                   rngs={"dropout": jax.random.PRNGKey(42)})
    assert bool(jnp.isfinite(out).all())


REMAT_TINY = {
    "egnn_mc": dict(num_layers=3, hidden_node_dim=8, hidden_edge_dim=8,
                    hidden_coord_dim=8),
    "painn": dict(num_layers=3, hidden_features=8, num_rbf=4),
    "segnn": dict(num_layers=3, hidden_features=8),
    "seconv": dict(num_layers=3, hidden_features=8),
    "cgenn": dict(num_layers=3, hidden_features=4),
    "gmn": dict(num_layers=3, hidden_features=8),
}


@pytest.mark.parametrize("name", sorted(REMAT_TINY))
def test_remat_matches_baseline(name):
    """Every scanned model family exposes ``remat`` (jax.checkpoint on the
    layer scan — the HBM knob for deep/wide shapes on one chip).  It must
    share the param tree with the default path (pinned scan names) and
    reproduce gradients bit-near: remat changes the backward schedule,
    never the math.  (equiformer_v2 has its own test: static dropout args.)"""
    import jax.flatten_util

    scene = make_scene(jax.random.PRNGKey(50))
    mask = G.knn_mask(scene.pos, 4)
    kw = REMAT_TINY[name]
    m0 = create_model(name, **kw)
    m1 = create_model(name, remat=True, **kw)
    params = m0.init(jax.random.PRNGKey(51), scene, mask)

    def loss(m):
        return lambda p: jnp.sum(m.apply(p, scene, mask) ** 2)

    g0, _ = jax.flatten_util.ravel_pytree(jax.grad(loss(m0))(params))
    g1, _ = jax.flatten_util.ravel_pytree(jax.grad(loss(m1))(params))
    # f32 reassociation in the recomputed forward wiggles the last ulps
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                               rtol=1e-4, atol=1e-5)
