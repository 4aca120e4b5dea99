"""Training: Noam schedule values, loss decrease, NaN discard, checkpoints."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
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
from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.train import (
    checkpoint as ckpt,
)
from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.train.losses import (
    build_loss_fn,
    percentage_errors,
    target_common_loss,
)
from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.train.optim import (
    create_optimizer,
    noam_schedule,
)
from types import SimpleNamespace


def test_noam_schedule_matches_reference_formula():
    """trainer.py:189-195: factor * size^-0.5 * min(step^-0.5, step*warmup^-1.5)."""
    sched = noam_schedule(0.5, model_size=128, factor=1.0, warmup=1000)
    for step in [0, 1, 10, 1000, 5000]:
        s = max(step, 1)
        want = 0.5 * 1.0 * 128**-0.5 * min(s**-0.5, s * 1000**-1.5)
        assert np.isclose(float(sched(step)), want, rtol=1e-6)


def test_target_common_loss_weighted_slices():
    pred = jnp.ones((2, 5, 6))
    y = jnp.zeros((2, 5, 6))
    scene = Scene.stationary(2, 5)
    total, terms = target_common_loss(
        pred, scene, y, ["pos_dt", "vel"], {"position": 2.0, "velocity": 0.5}
    )
    assert np.isclose(float(terms["Position loss"]), 2.0)
    assert np.isclose(float(terms["Velocity loss"]), 0.5)
    assert np.isclose(float(total), 2.5)


def test_percentage_errors():
    y = jnp.ones((1, 2, 6))
    pred = y * 1.1
    perc = percentage_errors(pred, y, ["pos_dt", "vel"])
    assert np.isclose(float(perc["pos_dt_perc_error"]), 10.0, atol=0.01)


def _tiny_training_setup(seed=0):
    scene = Scene(
        pos=jax.random.normal(jax.random.PRNGKey(seed), (4, 5, 3), jnp.float32),
        vel=jax.random.normal(jax.random.PRNGKey(seed + 1), (4, 5, 3), jnp.float32),
        force=jnp.zeros((4, 5, 3), jnp.float32),
        mass=jnp.ones((4, 5, 1), jnp.float32),
    )
    y = jax.random.normal(jax.random.PRNGKey(seed + 2), (4, 5, 6), jnp.float32) * 0.1
    model = create_model("egnn_mc", num_layers=2, hidden_node_dim=32,
                         hidden_edge_dim=32, hidden_coord_dim=32)
    mask = G.knn_mask(scene.pos, 4)
    params = model.init(jax.random.PRNGKey(seed + 3), scene, mask)
    return model, params, scene, y, mask


@pytest.mark.slow
def test_loss_decreases():
    model, params, scene, y, mask = _tiny_training_setup()
    args = SimpleNamespace(target="pos_dt+vel")
    loss_fn = build_loss_fn(args)
    tx = create_optimizer(0.5, model_size=32, warmup=10)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def lf(p):
            pred = model.apply(p, scene, mask)
            return loss_fn(pred, scene, y)[0]

        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(60):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses[::10]


@pytest.mark.slow
def test_nan_gradient_discard():
    """optax.apply_if_finite must skip updates on NaN grads
    (discard_nan_gradients semantics, trainer.py:207-213)."""
    model, params, scene, y, mask = _tiny_training_setup()
    tx = create_optimizer(0.5, model_size=32, discard_nan_gradients=True)
    opt_state = tx.init(params)
    bad_grads = jax.tree_util.tree_map(lambda p: jnp.full_like(p, jnp.nan), params)
    updates, opt_state2 = tx.update(bad_grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(new_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gradient_clipping_value_and_norm():
    tx_val = create_optimizer(1.0, 32, clip_value=1e-8)
    tx_norm = create_optimizer(1.0, 32, clip_norm=1e-8)
    p = {"w": jnp.ones((4,)) * 100.0}
    g = {"w": jnp.ones((4,)) * 100.0}
    for tx in (tx_val, tx_norm):
        st = tx.init(p)
        up, _ = tx.update(g, st, p)
        assert float(jnp.abs(up["w"]).max()) < 1.0  # clipped before adam


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    model, params, scene, y, mask = _tiny_training_setup()
    tx = create_optimizer(0.5, model_size=32)
    opt_state = tx.init(params)
    path = ckpt.save_checkpoint(str(tmp_path), params, opt_state, 7, {"best": 1.0})
    loaded = ckpt.load_checkpoint(path)
    assert loaded["step_count"] == 7
    assert loaded["best_metrics"] == {"best": 1.0}
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(loaded["params"])
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state structure round-trips
    flat_a = jax.tree_util.tree_leaves(opt_state)
    flat_b = jax.tree_util.tree_leaves(loaded["opt_state"])
    assert len(flat_a) == len(flat_b)


def test_dynamic_weighted_loss():
    """EMA-balanced pos/vel weighting (dynamic_weighted_loss.py:5-31): the
    target with the *smaller* running loss gets the larger weight, weights
    sum to 1, EMA state updates with alpha smoothing."""
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.train.losses import (
        dynamic_weighted_loss,
        dynamic_weighted_loss_init,
    )

    pred = jnp.zeros((2, 5, 6))
    y = jnp.concatenate(
        [jnp.full((2, 5, 3), 2.0), jnp.full((2, 5, 3), 1.0)], axis=-1
    )  # pos mse = 4, vel mse = 1
    state = dynamic_weighted_loss_init()
    loss, (rp, rv) = dynamic_weighted_loss(pred, y, state, alpha=0.5)
    assert np.isclose(float(rp), 0.5 * 1.0 + 0.5 * 4.0)
    assert np.isclose(float(rv), 0.5 * 1.0 + 0.5 * 1.0)
    # weight_pos = rv/(rp+rv), weight_vel = rp/(rp+rv)
    want = (1.0 / 3.5) * 4.0 + (2.5 / 3.5) * 1.0
    assert np.isclose(float(loss), want)
    # iterating drives the EMAs toward the true losses
    for _ in range(50):
        loss, (rp, rv) = dynamic_weighted_loss(pred, y, (rp, rv), alpha=0.5)
    assert np.isclose(float(rp), 4.0, atol=1e-3)
    assert np.isclose(float(rv), 1.0, atol=1e-3)


@pytest.mark.slow
def test_checkpoint_roundtrip_orbax(tmp_path):
    """Orbax backend: directory format, restore via live-template rebuild."""
    model, params, scene, y, mask = _tiny_training_setup()
    tx = create_optimizer(0.5, model_size=32)
    opt_state = tx.init(params)
    path = ckpt.save_checkpoint(
        str(tmp_path), params, opt_state, 11, {"best": 2.0}, backend="orbax"
    )
    assert path.endswith("model.orbax") and __import__("os").path.isdir(path)
    loaded = ckpt.load_checkpoint(
        path, template={"params": params, "opt_state": opt_state}
    )
    assert loaded["step_count"] == 11
    assert loaded["best_metrics"] == {"best": 2.0}
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(loaded["params"])
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optax namedtuple structure is rebuilt exactly
    assert jax.tree_util.tree_structure(loaded["opt_state"]) == (
        jax.tree_util.tree_structure(opt_state)
    )


def test_decode_next_state_all_targets():
    """core/targets.decode_next_state — the shared target-spec decode the
    reference lacks (it hard-codes pos_dt+vel in losses.py:64-67,99-103 and
    infer_self_feed.py:185-186)."""
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.core.targets import (
        decode_next_state,
    )

    B, N = 2, 4
    key = jax.random.PRNGKey(0)
    pos = jax.random.normal(key, (B, N, 3))
    vel = jax.random.normal(jax.random.PRNGKey(1), (B, N, 3))
    dp = jnp.full((B, N, 3), 0.1)
    dv = jnp.full((B, N, 3), 0.02)
    arr6 = jnp.concatenate([dp, dv], axis=-1)

    p, v = decode_next_state(arr6, pos, vel, "pos_dt+vel")
    np.testing.assert_allclose(np.asarray(p), np.asarray(pos + dp), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(v), np.asarray(dv), rtol=1e-6)

    p, v = decode_next_state(arr6, pos, vel, "pos_dt+vel_dt")
    np.testing.assert_allclose(np.asarray(v), np.asarray(vel + dv), rtol=1e-6)

    p, v = decode_next_state(arr6, pos, vel, "pos+vel")
    np.testing.assert_allclose(np.asarray(p), np.asarray(dp), rtol=1e-6)

    p, v = decode_next_state(arr6, pos, vel, "pos_com+vel")
    com = jnp.mean(pos, axis=1, keepdims=True)
    np.testing.assert_allclose(np.asarray(p), np.asarray(dp + com), rtol=1e-6)

    p, v = decode_next_state(dp, pos, vel, "pos")
    np.testing.assert_allclose(np.asarray(p), np.asarray(dp), rtol=1e-6)
    assert v is None

    with pytest.raises(ValueError, match="force"):
        decode_next_state(arr6, pos, vel, "force")


def test_aux_losses_target_aware():
    """com/momentum/energy losses decode predictions per the target spec:
    a perfect prediction yields ~zero aux loss under every 6-dim target."""
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.train.losses import (
        centre_of_mass_loss,
        momentum_loss,
    )

    B, N = 2, 5
    pos = jax.random.normal(jax.random.PRNGKey(0), (B, N, 3))
    vel = jax.random.normal(jax.random.PRNGKey(1), (B, N, 3))
    mass = jnp.ones((B, N, 1))
    scene = Scene(pos=pos, vel=vel, force=jnp.zeros_like(pos), mass=mass)

    next_pos = pos + 0.1
    next_vel = vel  # momentum-conserving next state

    encodings = {
        "pos_dt+vel": jnp.concatenate([next_pos - pos, next_vel], axis=-1),
        "pos_dt+vel_dt": jnp.concatenate(
            [next_pos - pos, next_vel - vel], axis=-1),
        "pos+vel": jnp.concatenate([next_pos, next_vel], axis=-1),
        "pos_com+vel": jnp.concatenate(
            [next_pos - jnp.mean(pos, axis=1, keepdims=True), next_vel],
            axis=-1),
    }
    for target, y in encodings.items():
        # pred == y: CoM loss must be exactly 0 under the right decode
        l = centre_of_mass_loss(y, scene, y, target=target)
        assert float(l) < 1e-10, (target, float(l))
        # momentum of the decoded next_vel equals current momentum
        l = momentum_loss(y, scene, y, weight=1.0, target=target)
        assert float(l) < 1e-10, (target, float(l))

    # the old hard-coded decode would NOT be zero for vel_dt/pos_com:
    y = encodings["pos_dt+vel_dt"]
    wrong = momentum_loss(y, scene, y, weight=1.0, target="pos_dt+vel")
    assert float(wrong) > 1e-6


def test_build_loss_fn_rejects_invalid_aux_targets():
    args = SimpleNamespace(target="pos", com_loss=False, energy_loss=True,
                           momentum_loss=False)
    with pytest.raises(ValueError, match="velocity component"):
        build_loss_fn(args)
    args = SimpleNamespace(target="force", com_loss=True, energy_loss=False,
                           momentum_loss=False)
    with pytest.raises(ValueError, match="com_loss"):
        build_loss_fn(args)
