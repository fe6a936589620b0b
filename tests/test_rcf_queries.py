"""Extended RCF query operators (density / impute / extrapolate /
near-neighbor / summarize) — statistical behavior mirroring the
reference's functional tests (RandomCutForestFunctionalTest density /
imputation / neighbor sections)."""

from __future__ import annotations

import numpy as np

from random_cut_forest_by_aws_spark.core import RCFForest
from random_cut_forest_by_aws_spark.core.queries import (
    conditional_field,
    density,
    extrapolate,
    impute,
    near_neighbors,
    summarize,
)


def _two_cluster_forest(n=2000, seed=3):
    rng = np.random.default_rng(seed)
    a = rng.normal(0, 0.2, size=(n // 2, 2)) + [5.0, 5.0]
    b = rng.normal(0, 0.2, size=(n // 2, 2)) + [-5.0, -5.0]
    X = np.vstack([a, b]).astype(np.float32)
    rng.shuffle(X)
    f = RCFForest(2, num_trees=30, sample_size=128, time_decay=0.0, seed=9)
    f.update_batch(X)
    return f, X


def test_density_orders_points():
    f, X = _two_cluster_forest()
    res = density(f, np.array([[5.0, 5.0], [0.0, 0.0], [50.0, 50.0]], np.float32))
    dens = res["density"]
    assert dens[0] > dens[1] > dens[2] >= 0
    assert dens[0] > 5 * dens[1]  # cluster center ≫ empty middle


def test_density_components_nonnegative():
    f, X = _two_cluster_forest()
    res = density(f, X[:20])
    for k in ("prob_high", "prob_low", "meas_high", "meas_low", "dist_high", "dist_low"):
        assert (res[k] >= 0).all()


def test_impute_uses_cluster_structure():
    f, _ = _two_cluster_forest()
    got = impute(f, np.array([5.0, 0.0], np.float32), missing=[1])
    assert abs(got[1] - 5.0) < 1.0  # x0=5 ⇒ cluster at (5,5)
    got2 = impute(f, np.array([-5.0, 0.0], np.float32), missing=[1])
    assert abs(got2[1] + 5.0) < 1.0


def test_conditional_field_returns_per_tree_candidates():
    f, _ = _two_cluster_forest()
    cands = conditional_field(f, np.array([5.0, 0.0], np.float32), [1])
    assert cands.shape == (30, 2)
    assert (cands[:, 0] == np.float32(5.0)).all()  # non-missing dims kept


def test_extrapolate_continues_level():
    """Constant-level series: forecast stays near the level."""
    rng = np.random.default_rng(0)
    level = 10.0
    series = level + rng.normal(0, 0.1, 3000)
    shingle_size = 4
    shingles = np.lib.stride_tricks.sliding_window_view(series, shingle_size)
    f = RCFForest(shingle_size, num_trees=30, sample_size=128, time_decay=0.0, seed=5)
    f.update_batch(shingles.astype(np.float32))
    last = shingles[-1].astype(np.float32)
    fc = extrapolate(f, last, horizon=5)
    assert fc["values"].shape == (5,)
    assert np.all(np.abs(fc["values"] - level) < 1.0)
    assert np.all(fc["upper"] >= fc["values"] - 1e-9)
    assert np.all(fc["lower"] <= fc["values"] + 1e-9)


def test_near_neighbors_exact_hit():
    f, X = _two_cluster_forest()
    # query an actually-sampled point: take any leaf from tree 0
    leaf = int(f.sleaf[0, 0])
    pt = f.bbmin[0, leaf].copy()
    res = near_neighbors(f, pt, distance_threshold=np.inf)
    assert len(res) >= 1
    assert res[0][1] == 0.0  # nearest is the point itself
    np.testing.assert_array_equal(res[0][0], pt)


def test_summarize_finds_two_clusters():
    f, _ = _two_cluster_forest()
    s = summarize(f, max_clusters=4)
    C = s["centers"]
    assert len(C) >= 2
    # the two dominant centers sit near (5,5) and (-5,-5)
    top2 = C[np.argsort(-s["weights"])[:2]]
    signs = sorted(np.sign(top2[:, 0]).tolist())
    assert signs == [-1.0, 1.0]
    for c in top2:
        assert abs(abs(c[0]) - 5) < 1.0 and abs(abs(c[1]) - 5) < 1.0


def test_dynamic_attribution_matches_displacement_score():
    """Kernel-driven attribution (getDynamicAttribution analogue) must
    keep the sum invariant: high+low sums to the matching dynamic score."""
    f, _ = _two_cluster_forest()
    pts = np.array([[5.0, 5.0], [0.0, 0.0], [-7.0, -4.0]], np.float32)
    disp = f.displacement_score(pts)
    hi, lo = f.displacement_attribution(pts)
    np.testing.assert_allclose((hi + lo).sum(1), disp, rtol=1e-9)
    # default kernels unchanged: attribution still sums to score
    hi0, lo0 = f.attribution(pts)
    np.testing.assert_allclose((hi0 + lo0).sum(1), f.score(pts), rtol=1e-9)


def test_near_neighbors_sequence_indexes():
    """with_sequences returns the sampler's stored sequence indexes for
    each neighbor (storeSequenceIndexesEnabled parity)."""
    from random_cut_forest_by_aws_spark.core import RCFForest

    rng = np.random.default_rng(4)
    X = rng.normal(0, 1, size=(500, 2)).astype(np.float32)
    f = RCFForest(2, num_trees=10, sample_size=64, time_decay=0.0, seed=9)
    f.update_batch(X, seqs=np.arange(1000, 1500))
    res = near_neighbors(f, X[100], with_sequences=True)
    assert len(res) >= 1
    pt, dist, mass, seqseen = res[0]
    assert dist == 0.0
    assert 1100 in seqseen  # the query point itself was seq 1100
    assert all(1000 <= s < 1500 for s in seqseen)
    # without the flag the legacy 3-tuple shape is preserved
    legacy = near_neighbors(f, X[100])
    assert len(legacy[0]) == 3


def test_summarize_multicenter_representatives():
    f, P = _two_cluster_forest()
    s = summarize(f, max_clusters=4, representatives=4)
    assert len(s["representatives"]) == len(s["centers"])
    for center, reps in zip(s["centers"], s["representatives"]):
        assert 1 <= len(reps) <= 4
        # shrunk representatives stay on their cluster's side of space
        assert (np.sign(reps[:, 0]) == np.sign(center[0])).all()


def test_impute_both_branch_picks_best_mode_deterministically():
    """MultiVisitor both-branch semantics: on a bimodal distribution where
    the observed dim pins the correct mode, every seed must impute the
    consistent mode — one-branch mass-proportional sampling would pick the
    wrong mode with probability ≈ its mass share (~50%)
    (ImputeVisitor.java:30-80, merge RandomCutForest.java:1040-1069)."""
    rng = np.random.default_rng(21)
    A = rng.normal([0.0, 0.0], 0.3, (300, 2))
    B = rng.normal([10.0, 10.0], 0.3, (300, 2))
    f = RCFForest(2, num_trees=30, sample_size=128, time_decay=0.0, seed=9)
    X = np.vstack([A, B]).astype(np.float32)
    rng.shuffle(X)
    f.update_batch(X)
    # observed dim 0 = 0.2 pins mode A; dim 1 missing
    for seed in range(20):
        got = impute(f, np.array([0.2, 0.0], np.float32), missing=[1], seed=seed)
        assert abs(got[1]) < 2.0, f"seed {seed}: imputed wrong mode {got[1]}"
    # and symmetric: observed near B imputes B's dim-1 mode
    for seed in range(20):
        got = impute(f, np.array([9.8, 0.0], np.float32), missing=[1], seed=seed)
        assert abs(got[1] - 10.0) < 2.0, f"seed {seed}: {got[1]}"


def test_conditional_field_centrality_widens_spread():
    """centrality < 1 blends a uniform tiebreak into the rank
    (adjustedRank, ImputeVisitor.java:246-249): candidates spread wider
    than the pure-rank (centrality=1) selection."""
    f, _ = _two_cluster_forest()
    x = np.array([5.0, 0.0], np.float32)
    tight = conditional_field(f, x, [1], seed=3, centrality=1.0)
    loose = conditional_field(f, x, [1], seed=3, centrality=0.0)
    assert np.std(loose[:, 1]) >= np.std(tight[:, 1])
