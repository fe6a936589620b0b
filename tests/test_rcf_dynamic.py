"""Dynamic-configuration parity features: pause/resume sampling, dynamic
time decay, pluggable score kernels (getDynamicScore analogue)."""

from __future__ import annotations

import numpy as np

from random_cut_forest_by_aws_spark.core import RCFForest


def test_pause_sampling_freezes_model():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(500, 2)).astype(np.float32)
    f = RCFForest(2, num_trees=5, sample_size=32, seed=1)
    f.update_batch(X)
    snap = {k: getattr(f, k).copy() for k in ("root", "mass", "sweight")}
    q = rng.normal(size=(10, 2)).astype(np.float32)
    s_before = f.score(q)
    f.pause_sampling()
    f.update_batch(rng.normal(size=(500, 2)).astype(np.float32) + 10.0,
                   seqs=np.arange(500, 1000, dtype=np.int64))
    np.testing.assert_array_equal(f.root, snap["root"])
    np.testing.assert_array_equal(f.sweight, snap["sweight"])
    np.testing.assert_array_equal(f.score(q), s_before)  # still scores
    f.resume_sampling()
    f.update_batch(rng.normal(size=(100, 2)).astype(np.float32),
                   seqs=np.arange(1000, 1100, dtype=np.int64))
    assert not np.array_equal(f.sweight, snap["sweight"])


def test_dynamic_time_decay_shifts_sample():
    f = RCFForest(1, num_trees=5, sample_size=64, time_decay=0.0, seed=3)
    X = np.arange(4000, dtype=np.float32).reshape(-1, 1)
    f.update_batch(X[:2000])
    # no decay: sample spread over history
    assert np.median(f.sseq[:, :]) < 1600
    f.set_time_decay(1 / 50)  # aggressive forgetting from here on
    f.update_batch(X[2000:], seqs=np.arange(2000, 4000, dtype=np.int64))
    assert np.median(f.sseq[:, :]) > 3200  # recent points dominate


def test_dynamic_score_kernels():
    rng = np.random.default_rng(5)
    X = rng.normal(size=(1500, 3)).astype(np.float32)
    f = RCFForest(3, num_trees=20, sample_size=128, time_decay=0.0, seed=7)
    f.update_batch(X)
    q_in = rng.normal(size=(20, 3)).astype(np.float32)
    q_out = (rng.normal(size=(5, 3)) + 8).astype(np.float32)
    # default kernel == explicit standard kernels
    s1 = f.score(q_in)
    s2 = f.score(
        q_in,
        score_seen=lambda d, m: 1.0 / (d + np.log2(m + 1.0)),
        score_unseen=lambda d, m: 1.0 / (d + 1.0),
    )
    np.testing.assert_allclose(s1, s2, rtol=1e-12)
    # displacement kernel: a far outlier separates near the root and
    # displaces (probability-weighted) nearly the whole tree mass
    disp_in = f.displacement_score(q_in)
    disp_out = f.displacement_score(q_out)
    assert np.median(disp_out) > np.median(disp_in)


def test_decay_checkpoint_roundtrip():
    rng = np.random.default_rng(9)
    f = RCFForest(2, num_trees=3, sample_size=32, time_decay=0.0, seed=11)
    f.update_batch(rng.normal(size=(200, 2)).astype(np.float32))
    f.set_time_decay(0.01)
    f.pause_sampling()
    g = RCFForest.from_state(f.to_state())
    assert g.paused and g.lam == f.lam
    assert g._decay_acc == f._decay_acc and g._decay_rel0 == f._decay_rel0


def test_transductive_with_rcf_distribution_equals_score():
    """TransductiveScalarScoreVisitor with gvec = box ranges (the RCF cut
    distribution) must reduce exactly to the standard score: p becomes
    range-growth/total and the non-separation weight becomes 1 − p
    (TransductiveScalarScoreVisitor.java:139,170 notes)."""
    import numpy as np

    from random_cut_forest_by_aws_spark.core.forest import RCFForest

    rng = np.random.default_rng(4)
    f = RCFForest(3, num_trees=20, sample_size=64, time_decay=0.0, seed=6)
    f.update_batch(rng.normal(0, 1, (2000, 3)).astype(np.float32))
    Xq = np.vstack([rng.normal(0, 1, (20, 3)), [[6.0, -6.0, 6.0]]]).astype(np.float32)
    base = f.score(Xq)
    trans = f.transductive_score(Xq, gvec=lambda bmin, bmax: bmax - bmin)
    # float32 box corners are promoted to float64 in the transductive
    # walk, so agreement is to ~1e-8, not bit-exact
    np.testing.assert_allclose(trans, base, rtol=1e-6, atol=1e-7)


def test_transductive_custom_distribution_reweights_dims():
    """A cut distribution that puts all weight on dim 0 makes the score
    insensitive to anomalies in other dims (the HyperTree.java:25-44
    build-distribution semantics applied transductively)."""
    import numpy as np

    from random_cut_forest_by_aws_spark.core.forest import RCFForest

    rng = np.random.default_rng(5)
    f = RCFForest(2, num_trees=20, sample_size=64, time_decay=0.0, seed=7)
    f.update_batch(rng.normal(0, 1, (2000, 2)).astype(np.float32))

    def dim0_only(bmin, bmax):
        g = np.zeros_like(bmin)
        g[:, 0] = np.maximum(bmax[:, 0] - bmin[:, 0], 1e-12)
        return g

    nominal = np.array([[0.1, 0.0]], np.float32)
    bad_dim1 = np.array([[0.1, 9.0]], np.float32)
    bad_dim0 = np.array([[9.0, 0.0]], np.float32)
    s_nom = f.transductive_score(nominal, gvec=dim0_only)[0]
    s_d1 = f.transductive_score(bad_dim1, gvec=dim0_only)[0]
    s_d0 = f.transductive_score(bad_dim0, gvec=dim0_only)[0]
    # dim-1 anomaly is invisible under a dim-0-only cut distribution;
    # dim-0 anomaly still stands out
    assert s_d0 > 2.0 * s_nom
    assert s_d1 < 0.5 * s_d0
