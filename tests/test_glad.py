"""GLAD (GlobalLocalAnomalyDetector analogue): clustering-based streaming
anomaly detection — in-distribution points score ≈ 1, outliers score
high and grade > 0 once the thresholder is warm."""

from __future__ import annotations

import numpy as np

from random_cut_forest_by_aws_spark.core.glad import GladDetector


def _stream(n=3000, seed=0):
    rng = np.random.default_rng(seed)
    centers = np.array([[6.0, 6.0], [-6.0, -6.0], [6.0, -6.0]])
    pick = rng.integers(0, 3, n)
    return centers[pick] + rng.normal(0, 0.5, (n, 2))


def test_glad_scores_outliers_high():
    det = GladDetector(capacity=256, max_clusters=6, seed=1)
    last = None
    for x in _stream():
        last = det.process(x)
    assert det.clusters is not None
    assert len(det.clusters["centers"]) >= 3
    # in-distribution point: score near 1, not anomalous
    ok = det.process(np.array([6.1, 5.8]))
    assert ok["score"] < 2.0
    assert ok["grade"] == 0.0
    # far outlier: high score, positive grade, attribution sums to ~1
    bad = det.process(np.array([0.0, 25.0]))
    assert bad["score"] > 3.0
    assert bad["grade"] > 0.0
    shares = [s for _, s in bad["candidates"]]
    assert abs(sum(shares) - 1.0) < 1e-6 or all(s <= 1.0 for s in shares)
    assert last is not None


def test_glad_exact_member_scores_zero():
    det = GladDetector(capacity=128, max_clusters=4, seed=3)
    X = _stream(1500, seed=5)
    for x in X:
        det.process(x)
    assert det.clusters is not None
    rep = det.clusters["representatives"][0][0]
    out = det.process(np.asarray(rep))
    assert out["score"] == 0.0


def test_glad_small_cluster_masking():
    """A tiny far-away clump below ignore_below cannot vouch for new
    points landing on it (anti-masking, :49-51)."""
    rng = np.random.default_rng(7)
    main = rng.normal([5, 5], 0.4, (2000, 2))
    det = GladDetector(capacity=256, max_clusters=6, ignore_below=0.05, seed=2)
    for x in main:
        det.process(x)
    # inject 3 colluding outliers (far clump, << 5% of reservoir weight)
    for x in rng.normal([-20, -20], 0.1, (3, 2)):
        det.process(x)
    # force a recluster so the clump could form a cluster
    det._last_cluster = -10**9
    det._last_mean = 99.0
    nxt = det.process(np.array([5.0, 5.0]))
    assert nxt["score"] < 2.0
    probe = det.process(np.array([-20.0, -20.0]))
    # the clump is masked out: the point scores against the main cluster
    assert probe["score"] > 3.0


def test_glad_occlusion_filters_far_cluster():
    det = GladDetector(capacity=256, max_clusters=4, seed=4)
    rng = np.random.default_rng(9)
    X = np.vstack([
        rng.normal([0, 0], 0.4, (1500, 2)),
        rng.normal([10, 0], 0.4, (1500, 2)),
    ])
    rng.shuffle(X)
    for x in X:
        det.process(x)
    assert det.clusters is not None and len(det.clusters["centers"]) >= 2
    # a point just outside the near cluster, collinear with the far one:
    # with occlusion the far cluster is dropped from the candidates
    x = np.array([2.0, 0.0])
    plain = det.score(x, consider_occlusion=False)
    occl = det.score(x, consider_occlusion=True)
    assert len(occl) <= len(plain)


def test_cluster_points_weighted_median_anchors_heavy_points():
    """Lloyd centers must honor point weights (regression: W ignored in
    the median step — GenericMultiCenter weighted semantics)."""
    from random_cut_forest_by_aws_spark.core.queries import cluster_points

    P = np.array([[0.0, 0.0]] * 5 + [[10.0, 10.0]] * 5)
    W = np.array([100.0] * 5 + [0.01] * 5)
    out = cluster_points(P, W, max_clusters=1, representatives=1,
                         rng=np.random.default_rng(0))
    # with one cluster, the weighted median sits on the heavy points
    np.testing.assert_allclose(out["centers"][0], [0.0, 0.0])
