"""Self-feed rollout: shapes, pos_dt integration, explosion freeze semantics."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.core.scene import (
    Scene,
)
from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.rollout import (
    make_rollout_fn,
)


class ConstantDrift(nn.Module):
    """Predicts a fixed pos_dt and copies velocity — analytic rollout."""

    drift: float = 0.1

    @nn.compact
    def __call__(self, scene, mask, train=False):
        d = jnp.full_like(scene.pos, self.drift)
        return jnp.concatenate([d, scene.vel], axis=-1)

    def get_model_size(self):
        return 1


class Exploder(nn.Module):
    """Multiplies positions by 100 each step -> explodes quickly."""

    @nn.compact
    def __call__(self, scene, mask, train=False):
        return jnp.concatenate([scene.pos * 99.0, scene.vel], axis=-1)

    def get_model_size(self):
        return 1


def scene0(B=3, N=4):
    k = jax.random.PRNGKey(0)
    pos = jax.random.normal(k, (B, N, 3), jnp.float32)
    return Scene(pos=pos, vel=jnp.ones_like(pos) * 0.5, force=jnp.zeros_like(pos),
                 mass=jnp.ones((B, N, 1), jnp.float32))


def test_rollout_shapes_and_integration():
    model = ConstantDrift()
    s0 = scene0()
    params = model.init(jax.random.PRNGKey(1), s0, None)
    fn = make_rollout_fn(model, num_steps=10)
    loc, vel, survived = fn(params, s0)
    assert loc.shape == (3, 10, 4, 3)
    assert vel.shape == (3, 10, 4, 3)
    # pos_dt integration: frame t = frame0 + t * drift (infer_self_feed.py:185-186)
    np.testing.assert_allclose(
        np.asarray(loc[:, 5]), np.asarray(s0.pos) + 5 * 0.1, rtol=1e-5
    )
    assert np.all(np.asarray(survived) == 9)


def test_explosion_freeze_and_steps_survived():
    model = Exploder()
    s0 = scene0()
    params = model.init(jax.random.PRNGKey(1), s0, None)
    fn = make_rollout_fn(model, num_steps=50)
    loc, vel, survived = fn(params, s0)
    sv = np.asarray(survived)
    assert np.all(sv < 49)  # explodes well before the end (|pos| *= 100/step)
    # after freezing, positions stop changing
    loc = np.asarray(loc)
    for b in range(loc.shape[0]):
        frozen_at = sv[b]
        np.testing.assert_array_equal(loc[b, frozen_at + 1], loc[b, -1])
    assert np.isfinite(loc).all()


def test_rollout_matmul_precision_and_fn_cache():
    """matmul_precision traces fine; the lru-cached builder reuses fns."""
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.rollout import (
        self_feed as SF,
    )

    model = ConstantDrift()
    s0 = scene0()
    params = model.init(jax.random.PRNGKey(0), s0, None)
    fn = make_rollout_fn(model, num_steps=10, matmul_precision="float32")
    loc, vel, survived = fn(params, s0)
    assert loc.shape == (3, 10, 4, 3) and np.isfinite(np.asarray(loc)).all()

    f1 = SF._cached_rollout_fn(
        model, 10, num_neighbors=None, target="pos_dt+vel", matmul_precision=None
    )
    f2 = SF._cached_rollout_fn(
        model, 10, num_neighbors=None, target="pos_dt+vel", matmul_precision=None
    )
    assert f1 is f2
    f3 = SF._cached_rollout_fn(
        model, 10, num_neighbors=None, target="pos_dt+vel", matmul_precision="float32"
    )
    assert f3 is not f1


class DropoutDrift(nn.Module):
    """Drift model with dropout on the predicted delta: stochastic only in
    train mode (the reference's self-feed never calls model.eval(), so
    models with live dropout roll out stochastically — trainer.py:373/:410)."""

    @nn.compact
    def __call__(self, scene, mask, train=False):
        d = jnp.full_like(scene.pos, 0.1)
        d = nn.Dropout(rate=0.5, deterministic=not train)(d)
        return jnp.concatenate([d, scene.vel], axis=-1)

    def get_model_size(self):
        return 1


def test_train_mode_rollout_is_stochastic_and_reproducible():
    model = DropoutDrift()
    s0 = scene0()
    params = model.init(jax.random.PRNGKey(1), s0, None)

    det = make_rollout_fn(model, num_steps=8)
    fn = make_rollout_fn(model, num_steps=8, train_mode=True)
    loc_det, _, _ = det(params, s0)
    loc_a, _, sa = fn(params, s0, jax.random.PRNGKey(0))
    loc_b, _, _ = fn(params, s0, jax.random.PRNGKey(7))
    loc_a2, _, _ = fn(params, s0, jax.random.PRNGKey(0))

    # dropout noise changes the trajectory vs deterministic rollout ...
    assert not np.allclose(np.asarray(loc_det), np.asarray(loc_a))
    # ... keys give distinct draws, the same key reproduces exactly
    assert not np.allclose(np.asarray(loc_a), np.asarray(loc_b))
    np.testing.assert_array_equal(np.asarray(loc_a), np.asarray(loc_a2))
    assert np.all(np.asarray(sa) == 7)


def test_train_mode_rollout_no_dropout_matches_deterministic():
    # models without dropout are unaffected by train-mode rollout
    model = ConstantDrift()
    s0 = scene0()
    params = model.init(jax.random.PRNGKey(1), s0, None)
    det = make_rollout_fn(model, num_steps=6)
    trn = make_rollout_fn(model, num_steps=6, train_mode=True)
    loc_d, _, _ = det(params, s0)
    loc_t, _, _ = trn(params, s0, jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(loc_d), np.asarray(loc_t), rtol=1e-6)


class ConstantDeltas(nn.Module):
    """Predicts fixed (Δpos, Δvel)-style outputs for target-semantics tests."""

    dpos: float = 0.1
    dvel: float = 0.01

    @nn.compact
    def __call__(self, scene, mask, train=False):
        return jnp.concatenate(
            [jnp.full_like(scene.pos, self.dpos),
             jnp.full_like(scene.vel, self.dvel)], axis=-1)

    def get_model_size(self):
        return 1


def test_rollout_vel_dt_integrates_velocity():
    """target='pos_dt+vel_dt': the velocity channel is a delta and must be
    integrated (the reference mis-feeds it as an absolute velocity,
    infer_self_feed.py:185-186)."""
    model = ConstantDeltas()
    s0 = scene0()
    params = model.init(jax.random.PRNGKey(1), s0, None)
    fn = make_rollout_fn(model, num_steps=8, target="pos_dt+vel_dt")
    loc, vel, survived = fn(params, s0)
    np.testing.assert_allclose(
        np.asarray(vel[:, 5]), np.asarray(s0.vel) + 5 * 0.01, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(loc[:, 5]), np.asarray(s0.pos) + 5 * 0.1, rtol=1e-5)


def test_rollout_pos_com_reoffsets_positions():
    """target='pos_com+vel': predictions are relative to the input frame's
    unweighted CoM (dataset_gravity_otf.py:234-236) and must be re-offset."""

    class ComEcho(nn.Module):
        """Predicts (pos - com(pos)) + 0.1 and copies velocity: under correct
        decode, next_pos = pos + 0.1 exactly."""

        @nn.compact
        def __call__(self, scene, mask, train=False):
            com = jnp.mean(scene.pos, axis=1, keepdims=True)
            return jnp.concatenate(
                [scene.pos - com + 0.1, scene.vel], axis=-1)

        def get_model_size(self):
            return 1

    model = ComEcho()
    s0 = scene0()
    params = model.init(jax.random.PRNGKey(1), s0, None)
    fn = make_rollout_fn(model, num_steps=6, target="pos_com+vel")
    loc, vel, _ = fn(params, s0)
    np.testing.assert_allclose(
        np.asarray(loc[:, 3]), np.asarray(s0.pos) + 3 * 0.1, rtol=1e-5)


def test_rollout_rejects_non_feedable_targets():
    import pytest

    for target in ("pos", "force"):
        with pytest.raises(ValueError, match="not self-feedable"):
            make_rollout_fn(ConstantDrift(), num_steps=5, target=target)
