"""Native C++ macro kernels vs the NumPy oracle implementations."""

import numpy as np
import pytest

from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.metrics import (
    macros as M,
    native,
)

lib = native.get_lib()
pytestmark = pytest.mark.skipif(lib is None, reason="native build unavailable")


def walk(seed=0, S=6, T=80, N=5, scale=0.06):
    rng = np.random.default_rng(seed)
    start = rng.normal(size=(S, 1, N, 3)) * 0.8
    return start + np.cumsum(rng.normal(size=(S, T, N, 3)) * scale, axis=1)


def test_stickings_collisions_match():
    loc = walk()
    ns, nc = native.count_stickings_and_collisions(loc)
    ps, pc = M.count_stickings_and_collisions(loc)
    np.testing.assert_array_equal(ns, ps)
    np.testing.assert_array_equal(nc, pc)
    assert ns.sum() + nc.sum() > 0


def test_leaving_match():
    loc = walk(scale=3.0)
    np.testing.assert_array_equal(
        native.count_balls_leaving_defined_area(loc),
        M.count_balls_leaving_defined_area(loc),
    )


def test_sharp_turns_match():
    vel = np.diff(walk(seed=1, scale=1.0), axis=1, prepend=0)
    for thr in (30, 45):
        np.testing.assert_array_equal(
            native.count_sharp_turns(vel, thr), M.count_sharp_turns(vel, thr)
        )


def test_max_com_match():
    loc = walk(seed=2)
    np.testing.assert_allclose(
        native.max_com_distance(loc), M.max_com_distance(loc), rtol=1e-12
    )


def test_group_collisions_match():
    # clustered walks produce actual stuck pairs/triplets
    loc = walk(seed=3, S=4, T=60, N=6, scale=0.15)
    got = native.count_group_collisions(loc)
    want = M.count_group_collisions(loc)
    np.testing.assert_array_equal(got, want)


def test_compute_all_macros_uses_native(monkeypatch):
    loc = walk(seed=4)
    vel = np.diff(loc, axis=1, prepend=loc[:, :1])
    with_native = M.compute_all_macros(loc, vel)
    monkeypatch.setenv("NBX_DISABLE_NATIVE", "1")
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", False)
    without = M.compute_all_macros(loc, vel)
    for k in with_native:
        np.testing.assert_allclose(with_native[k], without[k], rtol=1e-12)


def test_max_com_nan_parity():
    # diverged rollouts carry NaN frames; np.max propagates NaN and the
    # native kernel must agree or KS scoring becomes backend-dependent
    loc = walk(seed=5)
    loc[0, 10, 0, 0] = np.nan
    got = native.max_com_distance(loc)
    want = M.max_com_distance(loc)
    assert np.isnan(got[0]) and np.isnan(want[0])
    np.testing.assert_allclose(got[1:], want[1:], rtol=1e-12)


def test_wrappers_fall_back_without_native(monkeypatch):
    monkeypatch.setenv("NBX_DISABLE_NATIVE", "1")
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", False)
    loc = walk(seed=6, S=2, T=30, N=4)
    vel = np.diff(loc, axis=1, prepend=loc[:, :1])
    # every wrapper must degrade to its NumPy twin, not crash on lib=None
    s, c = native.count_stickings_and_collisions(loc)
    np.testing.assert_array_equal(s, M.count_stickings_and_collisions(loc)[0])
    np.testing.assert_array_equal(
        native.count_balls_leaving_defined_area(loc),
        M.count_balls_leaving_defined_area(loc),
    )
    np.testing.assert_allclose(
        native.max_com_distance(loc), M.max_com_distance(loc), rtol=1e-12
    )
    np.testing.assert_array_equal(
        native.count_sharp_turns(vel), M.count_sharp_turns(vel)
    )
    np.testing.assert_array_equal(
        native.count_group_collisions(loc), M.count_group_collisions(loc)
    )


def test_stuck_cluster_sizes_match():
    loc = walk(seed=7, S=6, T=80, N=7)
    np.testing.assert_allclose(
        native.stuck_cluster_sizes(loc), M.stuck_cluster_sizes(loc)
    )
    assert native.stuck_cluster_sizes(loc).sum() > 0


def test_stuck_cluster_sizes_match_large_n():
    loc = walk(seed=8, S=2, T=30, N=48, scale=0.3)
    np.testing.assert_allclose(
        native.stuck_cluster_sizes(loc), M.stuck_cluster_sizes(loc)
    )
