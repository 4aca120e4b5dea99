"""Macro kernels vs literal transcriptions of the reference Python loops,
KS/Fisher numerics, artifact JSON schema."""

import json
import os
from itertools import combinations

import numpy as np
import pytest

from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.metrics import (
    artifacts,
    ks,
    macros,
)


# ---- literal ports of the reference loops (test oracles) -------------------


def ref_stickings_collisions(loc, time_threshold=3, distance_threshold=0.5):
    num_sims, num_steps, n_balls, _ = loc.shape
    stick = np.zeros(num_sims)
    coll = np.zeros(num_sims)
    for sim in range(num_sims):
        ongoing = np.zeros((n_balls, n_balls))
        for step in range(1, num_steps):
            for i in range(n_balls):
                for j in range(i + 1, n_balls):
                    d = np.linalg.norm(loc[sim, step, i] - loc[sim, step, j])
                    if d <= distance_threshold:
                        ongoing[i, j] += 1
                        if ongoing[i, j] == 1:
                            coll[sim] += 1
                        if ongoing[i, j] == time_threshold:
                            stick[sim] += 1
                            coll[sim] -= 1
                    else:
                        ongoing[i, j] = 0
    return stick, coll


def ref_leaving(loc, distance_threshold=15):
    num_sims, num_steps, n_balls, _ = loc.shape
    out = np.zeros(num_sims)
    for s in range(num_sims):
        outside = np.zeros(n_balls)
        for t in range(1, num_steps):
            com = loc[s, t].mean(0)
            for b in range(n_balls):
                if np.linalg.norm(loc[s, t, b] - com) > distance_threshold:
                    outside[b] += 1
                else:
                    outside[b] = 0
        out[s] = len([i for i in outside if i > 10])
    return out


def ref_sharp_turns(vel, thr=30):
    num_sims, num_steps, n_balls, _ = vel.shape
    out = np.zeros(num_sims)
    for s in range(num_sims):
        for t in range(1, num_steps):
            for b in range(n_balls):
                a, bb = vel[s, t, b], vel[s, t - 1, b]
                with np.errstate(invalid="ignore", divide="ignore"):
                    cos = np.dot(a, bb) / (np.linalg.norm(a) * np.linalg.norm(bb))
                ang = np.degrees(np.arccos(np.clip(cos, -1, 1)))
                if ang > thr:
                    out[s] += 1
    return out


def ref_max_com(loc):
    num_sims, num_steps = loc.shape[:2]
    out = np.zeros(num_sims)
    for s in range(num_sims):
        start = loc[s, 0].mean(0)
        for t in range(1, num_steps):
            d = np.linalg.norm(loc[s, t].mean(0) - start)
            out[s] = max(out[s], d)
    return out


def clustered_walk(num_sims=4, num_steps=60, n=5, seed=0, scale=0.4):
    """Random walks with small steps so contacts/stickings actually happen."""
    rng = np.random.default_rng(seed)
    start = rng.normal(size=(num_sims, 1, n, 3)) * 0.8
    steps = rng.normal(size=(num_sims, num_steps, n, 3)) * scale * 0.15
    loc = start + np.cumsum(steps, axis=1)
    vel = np.diff(loc, axis=1, prepend=loc[:, :1])
    return loc, vel


def test_stickings_collisions_match_reference():
    loc, _ = clustered_walk()
    stick, coll = macros.count_stickings_and_collisions(loc)
    rs, rc = ref_stickings_collisions(loc)
    np.testing.assert_array_equal(stick, rs)
    np.testing.assert_array_equal(coll, rc)
    assert stick.sum() + coll.sum() > 0  # workload actually exercised


def test_leaving_matches_reference():
    loc, _ = clustered_walk(scale=8.0)  # big steps so bodies escape
    got = macros.count_balls_leaving_defined_area(loc)
    want = ref_leaving(loc)
    np.testing.assert_array_equal(got, want)


def test_sharp_turns_match_reference():
    _, vel = clustered_walk(scale=2.0)
    for thr in (30, 45):
        got = macros.count_sharp_turns(vel, thr)
        want = ref_sharp_turns(vel, thr)
        np.testing.assert_array_equal(got, want)
    assert got.sum() > 0


def test_max_com_matches_reference():
    loc, _ = clustered_walk()
    np.testing.assert_allclose(macros.max_com_distance(loc), ref_max_com(loc), rtol=1e-10)


def test_group_collisions_sanity():
    # Construct a scenario: bodies 0,1 stuck; 2,3,4 stuck; then groups meet.
    T, n = 30, 5
    loc = np.zeros((1, T, n, 3))
    loc[0, :, 0] = [0, 0, 0]
    loc[0, :, 1] = [0.5, 0, 0]
    loc[0, :, 2] = [10, 0, 0]
    loc[0, :, 3] = [10.5, 0, 0]
    loc[0, :, 4] = [10, 0.5, 0]
    # pair drifts toward the triplet, contact from t=20
    for t in range(T):
        shift = min(t, 20) * 0.45
        loc[0, t, 0, 0] += shift
        loc[0, t, 1, 0] += shift
    counts = macros.count_group_collisions(loc)
    assert counts[0] >= 1


def test_ks_and_fisher():
    rng = np.random.default_rng(0)
    a = rng.normal(size=500)
    b = rng.normal(size=500)
    p_same = ks.ks_p(a, b)
    p_diff = ks.ks_p(a, b + 3.0)
    assert p_same > 0.01 and p_diff < 1e-10
    assert np.isnan(ks.ks_p([], a))
    comb = ks.fisher_combine([0.5, 0.5, 0.5])
    assert 0 < comb < 1
    assert ks.fisher_combine([1e-310, np.nan]) == 1e-300 or np.isnan(
        ks.fisher_combine([np.nan])
    )
    # extreme underflow floors at 1e-300 (ks_utils.py:29)
    assert ks.fisher_combine([1e-200, 1e-200]) >= 1e-300


def test_artifact_schema_roundtrip(tmp_path):
    loc, vel = clustered_walk()
    per, combined, gt, pred = artifacts.evaluate_rollout(
        str(tmp_path), loc, vel, loc + 0.01, vel, save_trajectory_npys=True
    )
    # six scored macros present + max_com file
    for fname, field in artifacts.MACRO_FILES.items():
        path = tmp_path / fname
        assert path.exists(), fname
        data = json.loads(path.read_text())
        assert set(data) == {"ground truth", "predicted"}
        assert field in data["ground truth"]
        assert isinstance(data["ground truth"][field], list)
    # trajectory npy layout (infer_self_feed.py:231-248)
    assert (tmp_path / "trajectories_data" / "loc_actual_sim_0.npy").exists()
    assert (tmp_path / "trajectories_data" / "vel_pred_sim_3.npy").exists()
    # near-identical trajectories -> high combined p
    assert combined > 0.5
    back = artifacts.read_macro_jsons(str(tmp_path))
    np.testing.assert_allclose(
        back["sticking_histogram"]["ground truth"], gt["sticking_histogram"]
    )


def test_gt_vs_gt_noise_floor():
    """GT-vs-GT macro KS should not reject (the reference's baseline check,
    ks_test_model_checkpoints.py:171-188)."""
    loc1, vel1 = clustered_walk(seed=1, num_sims=24)
    loc2, vel2 = clustered_walk(seed=2, num_sims=24)
    g1 = macros.compute_all_macros(loc1, vel1)
    g2 = macros.compute_all_macros(loc2, vel2)
    _, combined = ks.macro_ks_pvalues(g1, g2)
    assert combined > 1e-4


def test_group_macro_gated_above_max_n(monkeypatch):
    """Above the N gate, group_collision_count is NaN (the macro is
    Θ(C(N,2)·C(N,3)) by reference construction — minutes/sim on dense
    N=100 data) and the KS pipeline scores the remaining macros: ks_p
    propagates NaN and fisher_combine drops it."""
    import numpy as np

    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.metrics import (
        ks as KS,
        macros,
    )

    rng = np.random.RandomState(0)
    loc = rng.randn(4, 30, 40, 3) * 5.0
    vel = rng.randn(4, 30, 40, 3)

    monkeypatch.setenv("NBX_GROUP_MACRO_MAX_N", "32")
    m = macros.compute_all_macros(loc, vel)  # N=40 > 32 -> gated
    assert np.isnan(m["group_collision_count"]).all()
    for k in ("sticking_histogram", "leaving_count", "sharp_turn_count_30"):
        assert not np.isnan(m[k]).any()

    ps = [KS.ks_p(np.asarray(m[k])[:2], np.asarray(m[k])[2:])
          for k in KS.SCORED_MACROS]
    assert any(p != p for p in ps)  # the gated macro contributes NaN
    combined = KS.fisher_combine(ps)
    assert combined == combined and 0.0 < combined <= 1.0

    monkeypatch.setenv("NBX_GROUP_MACRO_MAX_N", "64")
    m2 = macros.compute_all_macros(loc, vel)  # raised gate -> computed
    assert not np.isnan(m2["group_collision_count"]).any()


# ---- first-party stuck-cluster macro (round 5) -----------------------------


def ref_stuck_cluster(loc, time_threshold=2, distance_threshold=2.0):
    """Brute-force oracle: per step, BFS components over currently-stuck
    pairs (contact run containing t lasts >= time_threshold)."""
    num_sims, num_steps, n, _ = loc.shape
    out = np.zeros(num_sims)
    for s in range(num_sims):
        contact = np.zeros((num_steps, n, n), dtype=bool)
        for t in range(num_steps):
            for i in range(n):
                for j in range(i + 1, n):
                    d = np.linalg.norm(loc[s, t, i] - loc[s, t, j])
                    contact[t, i, j] = contact[t, j, i] = d <= distance_threshold
        # run length containing t, per pair
        stuck = np.zeros_like(contact)
        for i in range(n):
            for j in range(i + 1, n):
                t = 0
                while t < num_steps:
                    if not contact[t, i, j]:
                        t += 1
                        continue
                    e = t
                    while e + 1 < num_steps and contact[e + 1, i, j]:
                        e += 1
                    if e - t + 1 >= time_threshold:
                        stuck[t:e + 1, i, j] = stuck[t:e + 1, j, i] = True
                    t = e + 1
        acc = 0.0
        for t in range(num_steps):
            seen = set()
            best = 0
            for i in range(n):
                if i in seen or not stuck[t, i].any():
                    continue
                comp, stack = set(), [i]
                while stack:
                    x = stack.pop()
                    if x in comp:
                        continue
                    comp.add(x)
                    stack.extend(np.nonzero(stuck[t, x])[0].tolist())
                seen |= comp
                best = max(best, len(comp))
            acc += best
        out[s] = acc / num_steps
    return out


def test_stuck_cluster_reduces_to_pair_triplet_at_n5():
    """At N=5 the macro speaks the reference's stuck-pair/triplet vocabulary
    (group macro's primitives, visualization_utils.py:1455-1610): one stuck
    pair over k steps scores 2k/T, a stuck triplet 3k/T, and a disjoint
    pair+triplet takes the larger component (3k/T)."""
    T, n = 10, 5
    base = np.zeros((1, T, n, 3))
    for b in range(n):
        base[0, :, b, 0] = b * 10.0  # all isolated

    pair = base.copy()
    pair[0, 2:6, 1, 0] = pair[0, 2:6, 0, 0] + 1.0  # 0-1 stuck 4 steps
    np.testing.assert_allclose(macros.stuck_cluster_sizes(pair), [2 * 4 / T])

    trip = base.copy()
    trip[0, 3:8, 1, 0] = trip[0, 3:8, 0, 0] + 1.0
    trip[0, 3:8, 2, 0] = trip[0, 3:8, 0, 0] + 0.5  # 0-1-2 stuck 5 steps
    np.testing.assert_allclose(macros.stuck_cluster_sizes(trip), [3 * 5 / T])

    both = base.copy()
    both[0, 2:6, 1, 0] = both[0, 2:6, 0, 0] + 1.0      # pair 0-1
    both[0, 2:6, 3, 0] = both[0, 2:6, 2, 0] + 1.0      # triplet 2-3-4
    both[0, 2:6, 4, 0] = both[0, 2:6, 2, 0] + 0.5
    np.testing.assert_allclose(macros.stuck_cluster_sizes(both), [3 * 4 / T])

    # a single-step contact (< time_threshold) is not stuck
    brief = base.copy()
    brief[0, 4, 1, 0] = brief[0, 4, 0, 0] + 1.0
    np.testing.assert_allclose(macros.stuck_cluster_sizes(brief), [0.0])


def test_stuck_cluster_matches_bruteforce_oracle():
    loc, _ = clustered_walk(num_sims=3, num_steps=40, n=6, seed=3)
    np.testing.assert_allclose(
        macros.stuck_cluster_sizes(loc), ref_stuck_cluster(loc)
    )


def test_stuck_cluster_in_compute_all_and_substitution(monkeypatch):
    """compute_all_macros always emits stuck_cluster_size; above the group
    gate the KS combination substitutes it for the NaN group macro (six
    scored distributions at the bench shape), below the gate the published
    six-macro combination is bit-unchanged."""
    rng = np.random.RandomState(1)
    loc = rng.randn(6, 25, 40, 3) * 3.0
    vel = rng.randn(6, 25, 40, 3)
    monkeypatch.setenv("NBX_GROUP_MACRO_MAX_N", "32")
    g1 = macros.compute_all_macros(loc, vel)
    g2 = macros.compute_all_macros(loc + rng.randn(*loc.shape) * 0.05, vel)
    assert "stuck_cluster_size" in g1
    assert np.isnan(g1["group_collision_count"]).all()
    per, combined = ks.macro_ks_pvalues(g1, g2)
    assert per["stuck_cluster_size"] == per["stuck_cluster_size"]  # valid
    # six distributions combined: five ungated + the substitute
    vals = [per[k] for k in ks.SCORED_MACROS if per[k] == per[k]]
    assert len(vals) == 5
    assert combined == ks.fisher_combine(vals + [per["stuck_cluster_size"]])

    # below the gate: combination identical to the published basis
    loc5, vel5 = clustered_walk(num_sims=8, seed=4)
    m1 = macros.compute_all_macros(loc5, vel5)
    m2 = macros.compute_all_macros(loc5 + 0.01, vel5)
    per5, comb5 = ks.macro_ks_pvalues(m1, m2)
    assert comb5 == ks.fisher_combine([per5[k] for k in ks.SCORED_MACROS])


def test_stuck_cluster_artifact_roundtrip(tmp_path):
    loc, vel = clustered_walk(num_sims=6, seed=5)
    g = macros.compute_all_macros(loc, vel)
    artifacts.write_macro_jsons(str(tmp_path), g, g)
    assert os.path.exists(tmp_path / "stuck_cluster_distribution.json")
    back = artifacts.read_macro_jsons(str(tmp_path))
    np.testing.assert_allclose(
        back["stuck_cluster_size"]["ground truth"], g["stuck_cluster_size"]
    )
    # writers tolerate dicts without the extension macro (older callers)
    g2 = {k: v for k, v in g.items() if k != "stuck_cluster_size"}
    artifacts.write_macro_jsons(str(tmp_path / "old"), g2, g2)
    assert not os.path.exists(tmp_path / "old" / "stuck_cluster_distribution.json")
