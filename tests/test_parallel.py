"""Multi-chip sharding on the 8-device virtual CPU mesh: sharded train step
matches single-device numerics; sharded datagen and rollout execute."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from types import SimpleNamespace

from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.core import (
    graph as G,
)
from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.core.scene import (
    Scene,
)
from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.models import (
    create_model,
)
from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.parallel import (
    make_mesh,
    make_sharded_rollout_fn,
    make_sharded_train_step,
    shard_scene,
    sharded_datagen,
)
from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.train.losses import (
    build_loss_fn,
)
from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.train.optim import (
    create_optimizer,
)

pytestmark = [
    pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices"),
    # sharded-step compiles take minutes on this 1-CPU host; the driver's
    # dryrun_multichip exercises the sharding path every round regardless
    pytest.mark.slow,
]


def _setup(B=16, N=5):
    k = jax.random.PRNGKey(0)
    pos = jax.random.normal(k, (B, N, 3), jnp.float32)
    vel = jax.random.normal(jax.random.PRNGKey(1), (B, N, 3), jnp.float32)
    scene = Scene(pos=pos, vel=vel, force=jnp.zeros_like(pos), mass=jnp.ones((B, N, 1), jnp.float32))
    y = jax.random.normal(jax.random.PRNGKey(2), (B, N, 6), jnp.float32) * 0.1
    model = create_model("egnn_mc", num_layers=2, hidden_node_dim=16,
                         hidden_edge_dim=16, hidden_coord_dim=16)
    mask = G.knn_mask(scene.pos, 4)
    params = model.init(jax.random.PRNGKey(3), scene, mask)
    loss_fn = build_loss_fn(SimpleNamespace(target="pos_dt+vel"))
    tx = create_optimizer(0.5, model_size=16)
    return model, params, scene, y, loss_fn, tx


def test_sharded_train_step_matches_single_device():
    model, params, scene, y, loss_fn, tx = _setup()
    opt_state = tx.init(params)

    # single-device oracle
    def step(p, o):
        def lf(pp):
            mask = G.knn_mask(scene.pos, 4)
            pred = model.apply(pp, scene, mask, train=True, rngs={"dropout": jax.random.PRNGKey(9)})
            return loss_fn(pred, scene, y)[0]

        loss, grads = jax.value_and_grad(lf)(p)
        ups, o = tx.update(grads, o, p)
        return optax.apply_updates(p, ups), o, loss

    p1, _, loss1 = jax.jit(step)(params, opt_state)

    mesh = make_mesh(8)
    sstep = make_sharded_train_step(model, tx, loss_fn, 4, mesh)
    scene_sh = shard_scene(scene, mesh)
    y_sh = jax.device_put(y, scene_sh.pos.sharding)
    p2, _, loss2 = sstep(params, opt_state, scene_sh, y_sh, jax.random.PRNGKey(9))

    assert np.isclose(float(loss1), float(loss2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)


def test_sharded_datagen_runs_and_is_distributed():
    mesh = make_mesh(8)
    loc, vel, force, mass = sharded_datagen(
        jax.random.PRNGKey(0), mesh, batch_size=16, n_bodies=5, T=100, sample_freq=10
    )
    assert loc.shape == (16, 10, 5, 3)
    assert len(loc.sharding.device_set) == 8
    assert bool(jnp.isfinite(loc).all())


def test_sharded_rollout_runs():
    model, params, scene, y, loss_fn, tx = _setup()
    mesh = make_mesh(8)
    fn = make_sharded_rollout_fn(model, num_steps=5, mesh=mesh)
    scene_sh = shard_scene(scene, mesh)
    loc, vel, survived = fn(params, scene_sh)
    assert loc.shape == (16, 5, 5, 3)
    assert np.all(np.asarray(survived) == 4)


def test_trainer_auto_data_parallel(tmp_path, monkeypatch):
    """Trainer shards the sim batch over all 8 virtual devices."""
    monkeypatch.chdir(tmp_path)
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.train.trainer import (
        create_trainer_from_args,
    )
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.utils.config import (
        flatten_args,
    )

    cfg = {
        "main": {"model_type": "egnn_mc"},
        "models": {"egnn_mc": dict(num_layers=1, hidden_node_dim=16,
                                   hidden_edge_dim=16, hidden_coord_dim=16)},
        "dataloaders": {"egnn_mc_nbody": {
            "batch_size": 8, "cache_data": False, "seed": 0,
            "gravity_dataset": {"num_atoms": 5, "sim_length": 200, "sample_freq": 10},
        }},
        "trainers": {"trainer_nbody": {
            "steps_per_epoch": 3, "train_steps": 1, "test_macros_every": 99,
            "save_model_every": 99, "plot_macros": False, "seed": 0,
        }},
    }
    trainer = create_trainer_from_args(flatten_args(cfg))
    assert trainer.mesh is not None
    trainer.train_one_epoch()
    # params replicated across all devices after the sharded step
    leaf = jax.tree_util.tree_leaves(trainer.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_body_axis_mesh_constructs():
    mesh = make_mesh(8, body_parallel=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("sim", "body")


def test_ring_acceleration_matches_dense():
    """Body-sharded ring force pass (shard_map + ppermute over 8 virtual
    devices) equals the dense single-device kernel for single systems and
    batches."""
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.core.physics import (
        GravityParams,
        compute_acceleration,
    )
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.parallel import (
        make_ring_acceleration,
    )
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.parallel.mesh import (
        make_mesh,
    )

    params = GravityParams(interaction_strength=2.0, softening=0.2, dt=0.01, noise_var=0.0)
    mesh = make_mesh(body_parallel=8)
    ring = make_ring_acceleration(mesh, params)

    key = jax.random.PRNGKey(0)
    pos = jax.random.normal(key, (64, 3))
    mass = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (64, 1))) + 0.5
    want = compute_acceleration(pos[None], mass[None], 2.0, 0.2)[0]
    got = ring(pos, mass)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-6)

    # batched [B, N, 3]
    posb = jax.random.normal(jax.random.PRNGKey(2), (4, 32, 3))
    massb = jnp.ones((4, 32, 1))
    wantb = compute_acceleration(posb, massb, 2.0, 0.2)
    gotb = ring(posb, massb)
    np.testing.assert_allclose(np.asarray(gotb), np.asarray(wantb), rtol=2e-5, atol=1e-6)


def test_sharded_train_step_charged_scene():
    """Scene.charge is an optional pytree field: the factory's in_shardings
    must match a charged scene's structure (charged=True) or jit rejects it
    with a pytree mismatch (regression: shardings omitted charge)."""
    model, params, scene, y, loss_fn, tx = _setup()
    scene = Scene(
        pos=scene.pos, vel=scene.vel, force=scene.force, mass=scene.mass,
        charge=jnp.ones_like(scene.mass),
    )
    params = model.init(jax.random.PRNGKey(3), scene, G.knn_mask(scene.pos, 4))
    opt_state = tx.init(params)
    mesh = make_mesh(8)
    sstep = make_sharded_train_step(model, tx, loss_fn, 4, mesh, charged=True)
    scene_sh = shard_scene(scene, mesh)
    y_sh = jax.device_put(y, scene_sh.pos.sharding)
    _, _, loss = sstep(params, opt_state, scene_sh, y_sh, jax.random.PRNGKey(9))
    assert np.isfinite(float(loss))


def test_initialize_distributed_multi_host_failures_raise(monkeypatch):
    """A failed jax.distributed.initialize must raise when any standard
    multi-host launch marker is present (and stay a warning single-host)."""
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.parallel.mesh import (
        initialize_distributed,
    )

    def boom(**kwargs):
        raise RuntimeError("bad coordinator")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    for name in ("JAX_COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS",
                 "JAX_NUM_PROCESSES", "SLURM_NTASKS", "OMPI_COMM_WORLD_SIZE"):
        monkeypatch.delenv(name, raising=False)

    # single-host: swallowed with a warning
    with pytest.warns(UserWarning):
        initialize_distributed()
    # explicit kwargs imply multi-host intent
    with pytest.raises(RuntimeError):
        initialize_distributed(num_processes=2)
    with pytest.raises(RuntimeError):
        initialize_distributed(coordinator_address="10.0.0.1:1234")
    # launcher env markers imply multi-host intent
    for name, val in [("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234"),
                      ("MEGASCALE_COORDINATOR_ADDRESS", "10.0.0.1:1234"),
                      ("JAX_NUM_PROCESSES", "4"), ("SLURM_NTASKS", "2"),
                      ("OMPI_COMM_WORLD_SIZE", "2")]:
        monkeypatch.setenv(name, val)
        with pytest.raises(RuntimeError):
            initialize_distributed()
        monkeypatch.delenv(name)
    # markers set to 1 process stay single-host
    monkeypatch.setenv("SLURM_NTASKS", "1")
    with pytest.warns(UserWarning):
        initialize_distributed()


def test_make_mesh_raises_on_insufficient_devices():
    """Asking for more devices than visible must fail loudly, not silently
    truncate to a smaller mesh (the round-1 dryrun failure mode)."""
    with pytest.raises(ValueError, match="only 8 device"):
        make_mesh(16)


def test_dryrun_multichip_bootstraps_virtual_devices():
    """The driver entry must pass even when jax is bound to a small backend:
    it re-execs on a virtual CPU backend of the requested size.  Run it in a
    child pinned to ONE CPU device to reproduce the driver's 1-chip world."""
    import os
    import re
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        re.sub(r"--xla_force_host_platform_device_count=\d+", "",
               env.get("XLA_FLAGS", ""))
        + " --xla_force_host_platform_device_count=1"
    ).strip()
    env.pop("_GRAFT_DRYRUN_CHILD", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(4)"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dryrun_multichip OK" in out.stdout


def test_body_ring_rollout_matches_dense():
    """The body-sharded ring MODEL rollout (parallel/ring_egnn.py +
    make_body_ring_rollout_fn) must be exact vs the dense single-device
    rollout on the 8-device virtual mesh — SURVEY §5.7's big-N path run
    end-to-end, not just the force-pass unit (round-2 VERDICT #5)."""
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.models import (
        create_model,
    )
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.parallel.sharded import (
        make_body_ring_rollout_fn,
    )
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.rollout.self_feed import (
        make_rollout_fn,
    )

    B, N, T = 2, 16, 12
    mesh = make_mesh(8, body_parallel=8)
    scene = Scene(
        pos=jax.random.normal(jax.random.PRNGKey(0), (B, N, 3), jnp.float32),
        vel=jax.random.normal(jax.random.PRNGKey(1), (B, N, 3), jnp.float32) * 0.1,
        force=jnp.zeros((B, N, 3), jnp.float32),
        mass=jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (B, N, 1), jnp.float32))
        + 0.5,
    )
    kw = dict(num_layers=2, hidden_node_dim=32, hidden_edge_dim=32,
              hidden_coord_dim=32)
    m_ref = create_model("egnn_mc", **kw)
    m_ring = create_model("egnn_mc", body_ring=True, **kw)
    mask = G.knn_mask(scene.pos, N - 1)
    params = m_ref.init(jax.random.PRNGKey(2), scene, mask)

    loc_r, vel_r, sv_r = make_rollout_fn(m_ref, T, None)(params, scene)
    loc_g, vel_g, sv_g = make_body_ring_rollout_fn(m_ring, T, mesh)(params, scene)
    np.testing.assert_allclose(np.asarray(loc_g), np.asarray(loc_r), atol=2e-4)
    np.testing.assert_allclose(np.asarray(vel_g), np.asarray(vel_r), atol=2e-4)
    np.testing.assert_array_equal(np.asarray(sv_g), np.asarray(sv_r))


def test_body_ring_rollout_2d_mesh():
    """sim x body 2-D parallelism: each sim shard runs its own body ring on
    its mesh row; exact vs dense at every factorization."""
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.models import (
        create_model,
    )
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.parallel.sharded import (
        make_body_ring_rollout_fn,
    )
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.rollout.self_feed import (
        make_rollout_fn,
    )

    B, N, T = 4, 16, 8
    kw = dict(num_layers=1, hidden_node_dim=16, hidden_edge_dim=16,
              hidden_coord_dim=16)
    m_ref = create_model("egnn_mc", **kw)
    m_ring = create_model("egnn_mc", body_ring=True, **kw)
    scene = Scene(
        pos=jax.random.normal(jax.random.PRNGKey(0), (B, N, 3), jnp.float32),
        vel=jax.random.normal(jax.random.PRNGKey(1), (B, N, 3), jnp.float32) * 0.1,
        force=jnp.zeros((B, N, 3), jnp.float32),
        mass=jnp.ones((B, N, 1), jnp.float32),
    )
    params = m_ref.init(jax.random.PRNGKey(2), scene, G.knn_mask(scene.pos, N - 1))
    loc_r, _, sv_r = make_rollout_fn(m_ref, T, None)(params, scene)
    for body_p in (4, 2):
        mesh = make_mesh(8, body_parallel=body_p)
        loc_g, _, sv_g = make_body_ring_rollout_fn(m_ring, T, mesh)(params, scene)
        np.testing.assert_allclose(np.asarray(loc_g), np.asarray(loc_r), atol=2e-4)
        np.testing.assert_array_equal(np.asarray(sv_g), np.asarray(sv_r))
