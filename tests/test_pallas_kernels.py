"""Pallas TPU kernels vs their XLA reference paths (interpreter mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.core import (
    graph as G,
    physics,
)
from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.core.scene import (
    Scene,
)
from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.models import (
    create_model,
)
from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.ops.pallas import (
    egnn_messages as EM,
    gravity as GK,
)

pytestmark = pytest.mark.slow  # model-family compiles: excluded from the core tier


@pytest.mark.parametrize("B,N", [(4, 5), (2, 100), (1, 300)])
def test_pallas_gravity_matches_xla(B, N):
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.normal(size=(B, N, 3)), jnp.float32)
    mass = jnp.asarray(np.abs(rng.normal(size=(B, N, 1))) + 0.5, jnp.float32)
    want = physics.compute_acceleration(pos, mass, 2.0, 0.2)
    got = GK.pallas_acceleration(pos, mass, 2.0, 0.2, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-5
    )


def test_pallas_gravity_zero_softening_no_nan():
    """softening=0 must not NaN the diagonal (XLA path guards r2 > 0)."""
    rng = np.random.default_rng(1)
    pos = jnp.asarray(rng.normal(size=(2, 6, 3)), jnp.float32)
    mass = jnp.asarray(np.abs(rng.normal(size=(2, 6, 1))) + 0.5, jnp.float32)
    want = physics.compute_acceleration(pos, mass, 2.0, 0.0)
    got = GK.pallas_acceleration(pos, mass, 2.0, 0.0, interpret=True)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-5)


def test_fused_egnn_messages_bf16_trans_stays_f32():
    """trans feeds the f32 coordinate update — bf16 messages must not
    quantize it (mixed-precision pallas config)."""
    B, N, He, Hc = 1, 16, 16, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 9)
    mkb = lambda i, s: (jax.random.normal(ks[i], s, jnp.float32) * 0.2).astype(
        jnp.bfloat16
    )
    mask = jnp.ones((B, N, N), bool) & ~jnp.eye(N, dtype=bool)
    agg, trans = EM.fused_egnn_messages(
        mkb(0, (B, N, He)), mkb(1, (B, N, He)),
        jax.random.normal(ks[2], (B, N, N, 8), jnp.float32), mask,
        mkb(3, (5, He)), mkb(4, (He, He)), mkb(5, (He,)),
        mkb(6, (He, Hc)), mkb(7, (Hc,)), mkb(8, (Hc,)),
        interpret=True,
    )
    assert agg.dtype == jnp.bfloat16
    assert trans.dtype == jnp.float32


def test_fused_egnn_messages_matches_dense(monkeypatch):
    monkeypatch.setattr(
        EM, "fused_egnn_messages", functools.partial(EM.fused_egnn_messages, interpret=True)
    )
    B, N = 2, 32
    key = jax.random.PRNGKey(0)
    scene = Scene(
        pos=jax.random.normal(key, (B, N, 3), jnp.float32),
        vel=jax.random.normal(jax.random.PRNGKey(1), (B, N, 3), jnp.float32),
        force=jnp.zeros((B, N, 3), jnp.float32),
        mass=jnp.ones((B, N, 1), jnp.float32),
    )
    kw = dict(num_layers=2, hidden_node_dim=32, hidden_edge_dim=32, hidden_coord_dim=32)
    m_ref = create_model("egnn_mc", **kw)
    m_pal = create_model("egnn_mc", use_pallas=True, **kw)
    mask = G.knn_mask(scene.pos, N - 1)
    params = m_ref.init(jax.random.PRNGKey(2), scene, mask)
    out_ref = m_ref.apply(params, scene, mask)
    out_pal = m_pal.apply(params, scene, mask)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref), atol=1e-5)

    # non-trivial knn mask exercises the masked-mean path
    mask_k = G.knn_mask(scene.pos, 5)
    np.testing.assert_allclose(
        np.asarray(m_pal.apply(params, scene, mask_k)),
        np.asarray(m_ref.apply(params, scene, mask_k)),
        atol=1e-5,
    )


def test_fused_egnn_messages_v2_matches_v1():
    """The plane-layout kernel (version=2) must agree with version=1."""
    B, N, He, Hc = 2, 20, 16, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 9)
    mk = lambda i, s: jax.random.normal(ks[i], s, jnp.float32) * 0.2
    hA, hB = mk(0, (B, N, He)), mk(1, (B, N, He))
    geom = mk(2, (B, N, N, 8))
    mask = jnp.ones((B, N, N), bool) & ~jnp.eye(N, dtype=bool)
    args = (
        hA, hB, geom, mask, mk(3, (5, He)), mk(4, (He, He)), mk(5, (He,)),
        mk(6, (He, Hc)), mk(7, (Hc,)), mk(8, (Hc,)),
    )
    a1, t1 = EM.fused_egnn_messages(*args, interpret=True, version=1)
    a2, t2 = EM.fused_egnn_messages(*args, interpret=True, version=2)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=1e-5)


def test_egnn_mc_mixed_precision_close_to_f32():
    """compute_dtype='bfloat16' keeps coords f32 and tracks the f32 output."""
    B, N = 2, 8
    scene = Scene(
        pos=jax.random.normal(jax.random.PRNGKey(0), (B, N, 3), jnp.float32),
        vel=jax.random.normal(jax.random.PRNGKey(1), (B, N, 3), jnp.float32) * 0.1,
        force=jnp.zeros((B, N, 3), jnp.float32),
        mass=jnp.ones((B, N, 1), jnp.float32),
    )
    mask = G.knn_mask(scene.pos, N - 1)
    kw = dict(num_layers=2, hidden_node_dim=32, hidden_edge_dim=32, hidden_coord_dim=32)
    m32 = create_model("egnn_mc", **kw)
    mmx = create_model("egnn_mc", compute_dtype="bfloat16", **kw)
    params = m32.init(jax.random.PRNGKey(2), scene, mask)
    o32 = m32.apply(params, scene, mask)
    omx = mmx.apply(params, scene, mask)
    assert omx.dtype == jnp.float32
    rel = float(jnp.max(jnp.abs(o32 - omx)) / (jnp.max(jnp.abs(o32)) + 1e-9))
    assert rel < 0.05, rel


def test_fused_egnn_messages_padding_path(monkeypatch):
    """N not a multiple of the receiver tile exercises padding."""
    monkeypatch.setattr(
        EM, "fused_egnn_messages", functools.partial(EM.fused_egnn_messages, interpret=True)
    )
    B, N = 1, 20  # 20 % 16 != 0
    scene = Scene(
        pos=jax.random.normal(jax.random.PRNGKey(0), (B, N, 3), jnp.float32),
        vel=jax.random.normal(jax.random.PRNGKey(1), (B, N, 3), jnp.float32),
        force=jnp.zeros((B, N, 3), jnp.float32),
        mass=jnp.ones((B, N, 1), jnp.float32),
    )
    kw = dict(num_layers=1, hidden_node_dim=16, hidden_edge_dim=16, hidden_coord_dim=16)
    m_ref = create_model("egnn_mc", **kw)
    m_pal = create_model("egnn_mc", use_pallas=True, **kw)
    mask = G.knn_mask(scene.pos, N - 1)
    params = m_ref.init(jax.random.PRNGKey(2), scene, mask)
    np.testing.assert_allclose(
        np.asarray(m_pal.apply(params, scene, mask)),
        np.asarray(m_ref.apply(params, scene, mask)),
        atol=1e-5,
    )


def test_streaming_egnn_matches_dense(monkeypatch):
    """v3 streaming kernel (ops/pallas/egnn_stream.py): sender-tile
    accumulation + in-kernel featurization must be exact vs the dense path,
    sharing one param tree."""
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.ops.pallas import (
        egnn_stream as ES,
    )

    monkeypatch.setattr(
        ES, "streaming_egnn_messages",
        functools.partial(ES.streaming_egnn_messages, interpret=True),
    )
    B, N = 2, 20
    scene = Scene(
        pos=jax.random.normal(jax.random.PRNGKey(0), (B, N, 3), jnp.float32),
        vel=jax.random.normal(jax.random.PRNGKey(1), (B, N, 3), jnp.float32),
        force=jnp.zeros((B, N, 3), jnp.float32),
        mass=jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (B, N, 1), jnp.float32))
        + 0.5,
    )
    kw = dict(num_layers=2, hidden_node_dim=32, hidden_edge_dim=32,
              hidden_coord_dim=32)
    m_ref = create_model("egnn_mc", **kw)
    # tile sizes that do NOT divide N exercise both paddings; multiple
    # sender tiles exercise the accumulation across j
    m_str = create_model("egnn_mc", streaming=True, pallas_tile=8,
                         stream_tile_j=8, **kw)
    mask = G.knn_mask(scene.pos, N - 1)
    params = m_ref.init(jax.random.PRNGKey(2), scene, mask)
    np.testing.assert_allclose(
        np.asarray(m_str.apply(params, scene, mask)),
        np.asarray(m_ref.apply(params, scene, mask)),
        atol=1e-5,
    )
    # non-trivial knn mask: masked means must accumulate correct counts
    mask_k = G.knn_mask(scene.pos, 5)
    np.testing.assert_allclose(
        np.asarray(m_str.apply(params, scene, mask_k)),
        np.asarray(m_ref.apply(params, scene, mask_k)),
        atol=1e-5,
    )


def test_streaming_egnn_bf16_trans_stays_f32():
    """Mixed-precision streaming: trans feeds the f32 coordinate update."""
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.ops.pallas import (
        egnn_stream as ES,
    )

    B, N, He, Hc = 1, 16, 16, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 12)
    mkb = lambda i, s: (jax.random.normal(ks[i], s, jnp.float32) * 0.2).astype(
        jnp.bfloat16
    )
    mkf = lambda i, s: jax.random.normal(ks[i], s, jnp.float32) * 0.2
    mask = jnp.ones((B, N, N), bool) & ~jnp.eye(N, dtype=bool)
    agg, trans = ES.streaming_egnn_messages(
        mkb(0, (B, N, He)), mkb(1, (B, N, He)),
        mkf(2, (B, N, 3)), mkf(3, (B, N, 3)),
        jnp.ones((B, N, 1), jnp.float32), mkf(4, (B, N, 3)), mask,
        mkb(5, (5, He)), mkb(6, (He, He)), mkb(7, (He,)),
        mkb(8, (He, Hc)), mkb(9, (Hc,)), mkb(10, (Hc,)),
        interpret=True, tile_i=8, tile_j=8,
    )
    assert agg.dtype == jnp.bfloat16
    assert trans.dtype == jnp.float32
    assert np.isfinite(np.asarray(trans)).all()


def test_streaming_egnn_elem_bf16_close_to_f32():
    """elem_bf16: the [TI,TJ,He] elementwise stack (silus + mask multiply)
    runs in bf16 for 2x VPU packing; result must stay within the bf16
    rounding class of the f32-elementwise kernel (matmuls f32-accumulated
    either way)."""
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.ops.pallas import (
        egnn_stream as ES,
    )

    B, N, He, Hc = 2, 24, 32, 32
    ks = jax.random.split(jax.random.PRNGKey(7), 12)
    mk = lambda i, s, sc=1.0: jax.random.normal(ks[i], s, jnp.float32) * sc
    pos0 = mk(2, (B, N, 3))
    mask = (jax.random.uniform(ks[5], (B, N, N)) > 0.2) & ~jnp.eye(N, dtype=bool)[None]
    args = (
        mk(0, (B, N, He)), mk(1, (B, N, He)), pos0, mk(3, (B, N, 3), 0.3),
        jnp.ones((B, N, 1), jnp.float32), pos0 + mk(4, (B, N, 3), 0.05), mask,
        mk(6, (5, He), 0.1), mk(7, (He, He), 0.1), mk(8, (He,), 0.1),
        mk(9, (He, Hc), 0.1), mk(10, (Hc,), 0.1), mk(11, (Hc,), 0.1),
    )
    f = functools.partial(
        ES.streaming_egnn_messages, interpret=True, tile_i=8, tile_j=8
    )
    a0, t0 = f(*args, elem_bf16=False)
    a1, t1 = f(*args, elem_bf16=True)
    assert a1.dtype == a0.dtype and t1.dtype == jnp.float32
    rel_a = float(jnp.max(jnp.abs(a1 - a0)) / (jnp.max(jnp.abs(a0)) + 1e-9))
    rel_t = float(jnp.max(jnp.abs(t1 - t0)) / (jnp.max(jnp.abs(t0)) + 1e-9))
    assert rel_a < 2e-2 and rel_t < 2e-2, (rel_a, rel_t)


def test_streaming_model_elem_bf16_plumbing(monkeypatch):
    """stream_elem_bf16 on the model reaches the kernel and stays within
    the bf16 rounding class of the dense path at the model level."""
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.ops.pallas import (
        egnn_stream as ES,
    )

    monkeypatch.setattr(
        ES, "streaming_egnn_messages",
        functools.partial(ES.streaming_egnn_messages, interpret=True),
    )
    B, N = 2, 16
    scene = Scene(
        pos=jax.random.normal(jax.random.PRNGKey(0), (B, N, 3), jnp.float32),
        vel=jax.random.normal(jax.random.PRNGKey(1), (B, N, 3), jnp.float32),
        force=jnp.zeros((B, N, 3), jnp.float32),
        mass=jnp.ones((B, N, 1), jnp.float32),
    )
    kw = dict(num_layers=2, hidden_node_dim=32, hidden_edge_dim=32,
              hidden_coord_dim=32)
    m_ref = create_model("egnn_mc", **kw)
    m_ebf = create_model("egnn_mc", streaming=True, stream_elem_bf16=True,
                         pallas_tile=8, stream_tile_j=8, **kw)
    mask = G.knn_mask(scene.pos, N - 1)
    params = m_ref.init(jax.random.PRNGKey(2), scene, mask)
    ref = np.asarray(m_ref.apply(params, scene, mask))
    ebf = np.asarray(m_ebf.apply(params, scene, mask))
    rel = np.max(np.abs(ebf - ref)) / (np.max(np.abs(ref)) + 1e-9)
    assert rel < 2e-2, rel
