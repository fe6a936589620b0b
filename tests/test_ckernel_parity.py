"""C update-kernel parity: the compiled path must be bit-identical to
the pure-Python path — every canonical array, the sampler state, and the
per-tree PCG64 states — over streams with duplicates, evictions,
chunked delivery and partial fills."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from random_cut_forest_by_aws_spark.core import forest as fmod
from random_cut_forest_by_aws_spark.core.forest import RCFForest

ck = fmod._ckernel()
pytestmark = pytest.mark.skipif(
    ck is None, reason="C kernel unavailable (no gcc or self-check failed)"
)


def _forest(d, **kw):
    return RCFForest(d, **kw)


def _update_py(f: RCFForest, X, seqs=None):
    """Force the pure-Python path for one batch."""
    saved = fmod._CK_MOD
    fmod._CK_MOD = False
    try:
        f.update_batch(X, seqs)
    finally:
        fmod._CK_MOD = saved


def _py_path(fn, *a, **kw):
    """Run any forest call with the C kernel disabled."""
    saved = fmod._CK_MOD
    fmod._CK_MOD = False
    try:
        return fn(*a, **kw)
    finally:
        fmod._CK_MOD = saved


def _assert_identical(a: RCFForest, b: RCFForest):
    for name in RCFForest._ARRAY_FIELDS:
        np.testing.assert_array_equal(
            getattr(a, name), getattr(b, name), err_msg=name
        )
    for ga, gb in zip(a._rngs, b._rngs):
        sa, sb = ga.bit_generator.state["state"], gb.bit_generator.state["state"]
        assert sa["state"] == sb["state"] and sa["inc"] == sb["inc"]
    assert a.entries == b.entries and a._last_rel == b._last_rel


def test_c_path_is_active_by_default():
    assert fmod._ckernel() is not None and fmod._ckernel().AVAILABLE


@settings(max_examples=12, deadline=None)
@given(
    n=st.integers(30, 600),
    d=st.integers(1, 9),
    k=st.sampled_from([8, 32, 64]),
    dup_every=st.integers(2, 12),
    seed=st.integers(0, 99_999),
    chunk=st.integers(16, 200),
)
def test_chunked_streams_bit_identical(n, d, k, dup_every, seed, chunk):
    rng = np.random.default_rng(seed)
    X = rng.normal(0, 1, size=(n, d)).astype(np.float32)
    X[::dup_every] = X[0]  # exact duplicates → leaf-mass path
    fc = _forest(d, num_trees=5, sample_size=k, time_decay=0.01, seed=seed)
    fp = _forest(d, num_trees=5, sample_size=k, time_decay=0.01, seed=seed)
    for lo in range(0, n, chunk):
        sl = slice(lo, min(lo + chunk, n))
        seqs = np.arange(sl.start, sl.stop, dtype=np.int64)
        fc.update_batch(X[sl], seqs)
        _update_py(fp, X[sl], seqs)
        _assert_identical(fc, fp)
    # C scoring vs forced-Python scoring on the identical state
    q = rng.normal(0, 2, size=(25, d)).astype(np.float32)
    np.testing.assert_array_equal(fc.score(q), _py_path(fp.score, q))


def test_initial_accept_ramp_parity():
    """f_init < 1 exercises the ramp branch (iu comparisons + max scan)."""
    rng = np.random.default_rng(5)
    X = rng.normal(0, 1, size=(500, 3)).astype(np.float32)
    kw = dict(num_trees=6, sample_size=64, time_decay=0.02, seed=11,
              initial_accept_fraction=0.3)
    fc = _forest(3, **kw)
    fp = _forest(3, **kw)
    fc.update_batch(X)
    _update_py(fp, X)
    _assert_identical(fc, fp)


def test_integer_grid_heavy_duplicates_parity():
    """Integer coordinates force massive duplication and zero-gap dims —
    the float-fallback cut branch and duplicate bumps."""
    rng = np.random.default_rng(9)
    X = rng.integers(-3, 4, size=(800, 2)).astype(np.float32)
    fc = _forest(2, num_trees=4, sample_size=32, time_decay=0.05, seed=2)
    fp = _forest(2, num_trees=4, sample_size=32, time_decay=0.05, seed=2)
    fc.update_batch(X[:400])
    _update_py(fp, X[:400])
    _assert_identical(fc, fp)
    fc.update_batch(X[400:], seqs=np.arange(400, 800))
    _update_py(fp, X[400:], seqs=np.arange(400, 800))
    _assert_identical(fc, fp)


def test_dynamic_decay_and_pause_parity():
    rng = np.random.default_rng(3)
    X = rng.normal(0, 1, size=(300, 4)).astype(np.float32)
    fc = _forest(4, num_trees=3, sample_size=32, time_decay=0.01, seed=7)
    fp = _forest(4, num_trees=3, sample_size=32, time_decay=0.01, seed=7)
    fc.update_batch(X[:100]); _update_py(fp, X[:100])
    for f in (fc, fp):
        f.set_time_decay(0.05)
    fc.update_batch(X[100:200], np.arange(100, 200))
    _update_py(fp, X[100:200], np.arange(100, 200))
    for f in (fc, fp):
        f.pause_sampling()
    fc.update_batch(X[200:250], np.arange(200, 250))
    _update_py(fp, X[200:250], np.arange(200, 250))
    for f in (fc, fp):
        f.resume_sampling()
    fc.update_batch(X[250:], np.arange(250, 300))
    _update_py(fp, X[250:], np.arange(250, 300))
    _assert_identical(fc, fp)


@settings(max_examples=10, deadline=None)
@given(
    n=st.integers(80, 500),
    d=st.integers(1, 9),
    k=st.sampled_from([16, 64, 256]),
    seed=st.integers(0, 99_999),
)
def test_score_lanes_bit_identical(n, d, k, seed):
    """C score walk vs vectorized Python walk on the same state: exact
    duplicates of sampled points (eq/damp path), in-distribution points
    (partial walks) and far outliers (full root walks)."""
    rng = np.random.default_rng(seed)
    X = rng.normal(0, 1, size=(n, d)).astype(np.float32)
    f = RCFForest(d, num_trees=7, sample_size=k, time_decay=0.01, seed=seed)
    f.update_batch(X)
    q = np.vstack([
        X[:20],                                   # seen points
        rng.normal(0, 1, (20, d)),                # near
        rng.normal(0, 8, (10, d)),                # far outside every box
        np.zeros((1, d)),
    ]).astype(np.float32)
    c_scores = f.score(q)
    py_scores = _py_path(f.score, q)
    np.testing.assert_array_equal(c_scores, py_scores)


def test_score_high_dim_pairwise_recursion():
    """d=70 makes the 2d-gap sum length 140 > 128 — exercises the
    recursive split branch of the pairwise sum."""
    rng = np.random.default_rng(77)
    d = 70
    X = rng.normal(0, 1, size=(300, d)).astype(np.float32)
    f = RCFForest(d, num_trees=4, sample_size=64, time_decay=0.0, seed=3)
    f.update_batch(X)
    q = np.vstack([X[:10], rng.normal(0, 4, (30, d))]).astype(np.float32)
    np.testing.assert_array_equal(f.score(q), _py_path(f.score, q))


def test_score_integer_grid_duplicates():
    """Heavy duplication → large leaf masses, zero-gap dims, eq paths."""
    rng = np.random.default_rng(13)
    X = rng.integers(-2, 3, size=(600, 3)).astype(np.float32)
    f = RCFForest(3, num_trees=5, sample_size=128, time_decay=0.02, seed=8)
    f.update_batch(X)
    q = np.vstack([X[:30], rng.integers(-6, 7, (30, 3))]).astype(np.float32)
    np.testing.assert_array_equal(f.score(q), _py_path(f.score, q))


def test_score_approximate_parity():
    """score_approximate routes its block lanes through the same C walk;
    sums and accepted counts must match the Python path exactly."""
    rng = np.random.default_rng(29)
    X = rng.normal(0, 1, size=(400, 4)).astype(np.float32)
    f = RCFForest(4, num_trees=20, sample_size=64, time_decay=0.01, seed=5)
    f.update_batch(X)
    q = np.vstack([X[:15], rng.normal(0, 5, (15, 4))]).astype(np.float32)
    sc, nc = f.score_approximate(q, precision=0.2, return_accepted=True)
    sp, npy = _py_path(f.score_approximate, q, precision=0.2,
                       return_accepted=True)
    np.testing.assert_array_equal(sc, sp)
    np.testing.assert_array_equal(nc, npy)
    # precision<=0 must reproduce score() exactly on both paths
    np.testing.assert_array_equal(
        f.score_approximate(q, precision=0.0), f.score(q)
    )


def test_checkpoint_roundtrip_crosses_paths():
    """A checkpoint written after C updates resumes bit-exactly on the
    Python path and vice versa — the state format is path-agnostic."""
    rng = np.random.default_rng(21)
    X = rng.normal(0, 1, size=(400, 5)).astype(np.float32)
    fc = _forest(5, num_trees=4, sample_size=32, time_decay=0.01, seed=4)
    fc.update_batch(X[:200])
    resumed = RCFForest.from_state(fc.to_state())
    fc.update_batch(X[200:], np.arange(200, 400))          # C continues
    _update_py(resumed, X[200:], np.arange(200, 400))      # Python continues
    _assert_identical(fc, resumed)


@settings(max_examples=10, deadline=None)
@given(
    n=st.integers(60, 800),
    d=st.integers(1, 9),
    k=st.sampled_from([16, 64, 128]),
    seed=st.integers(0, 99_999),
)
def test_attribution_lanes_bit_identical(n, d, k, seed):
    """C attribution walk vs vectorized Python walk: duplicate-heavy
    streams (shadow-box path), in-distribution and far queries."""
    rng = np.random.default_rng(seed)
    X = np.round(rng.normal(0, 1, size=(n, d)), 1).astype(np.float32)
    f = RCFForest(d, num_trees=7, sample_size=k, time_decay=0.01, seed=seed)
    f.update_batch(X)
    q = np.vstack([
        X[:20],                                   # exact duplicates (eq path)
        rng.normal(0, 1, (15, d)),
        rng.normal(0, 8, (10, d)),
    ]).astype(np.float32)
    hi_c, lo_c = f.attribution(q)
    hi_p, lo_p = _py_path(f.attribution, q)
    np.testing.assert_array_equal(hi_c, hi_p)
    np.testing.assert_array_equal(lo_c, lo_p)
    # sum invariant: high+low == score on the C path too
    np.testing.assert_allclose(
        hi_c.sum(1) + lo_c.sum(1), f.score(q), rtol=1e-6, atol=1e-9
    )


def test_attribution_high_dim_pairwise_recursion():
    """d=70 pushes the float64 row sums past the 8-accumulator block —
    exercises pw_sum_f64's unrolled and recursive branches."""
    rng = np.random.default_rng(78)
    d = 70
    X = rng.normal(0, 1, size=(300, d)).astype(np.float32)
    f = RCFForest(d, num_trees=4, sample_size=64, time_decay=0.0, seed=3)
    f.update_batch(X)
    q = np.vstack([X[:10], rng.normal(0, 4, (30, d))]).astype(np.float32)
    hi_c, lo_c = f.attribution(q)
    hi_p, lo_p = _py_path(f.attribution, q)
    np.testing.assert_array_equal(hi_c, hi_p)
    np.testing.assert_array_equal(lo_c, lo_p)


def test_attribution_approximate_parity():
    """attribution_approximate routes its accepted lanes through the C
    walk (per-row division by accepted counts)."""
    rng = np.random.default_rng(30)
    X = np.round(rng.normal(0, 1, size=(400, 4)), 1).astype(np.float32)
    f = RCFForest(4, num_trees=20, sample_size=64, time_decay=0.01, seed=5)
    f.update_batch(X)
    q = np.vstack([X[:15], rng.normal(0, 5, (15, 4))]).astype(np.float32)
    hi_c, lo_c = f.attribution_approximate(q, precision=0.2)
    hi_p, lo_p = _py_path(f.attribution_approximate, q, precision=0.2)
    np.testing.assert_array_equal(hi_c, hi_p)
    np.testing.assert_array_equal(lo_c, lo_p)


def _ref_attribution_tree(f: RCFForest, t: int, x32: np.ndarray):
    """Scalar transcription of the reference visitor for ONE tree
    (AnomalyAttributionVisitor.java:34, AbstractAttributionVisitor.java:
    113-167): descent, leaf DiVector, then either the duplicate-leaf
    shadow walk with the RUNNING sibling-box union
    (shadowBox.getMergedBox, :125-127) + renormalize, or the unseen
    leaf-to-root probability mix. Pure float64 scalar math — for d < 8
    numpy's pairwise row sums are sequential, so this matches the
    vectorized paths bit-for-bit."""
    cutdim, cutval, left, right, parent, bbmin, bbmax, mass = f._flat()
    N, d = f.N, f.d
    base = t * N
    a = base + int(f.root[t])
    x64 = [float(v) for v in x32]
    depth = 0
    while cutdim[a] >= 0:
        child = right[a] if x32[cutdim[a]] > cutval[a] else left[a]
        a = base + int(child)
        depth += 1
    lp = bbmin[a]
    dh = [max(x64[i] - float(lp[i]), 0.0) for i in range(d)]
    dl = [max(float(lp[i]) - x64[i], 0.0) for i in range(d)]
    sumnew = 0.0
    for i in range(d):
        sumnew += dh[i] + dl[i]
    eq = sumnew <= 0.0
    lm = float(mass[a])
    dd = float(depth)
    tm = float(mass[base + int(f.root[t])])
    tiny = float(np.finfo(np.float32).tiny)
    if eq:
        saved = (1.0 - lm / (2.0 * max(tm, 1.0))) * (
            1.0 / (dd + float(np.log2(np.float64(lm + 1.0))))
        )
        h = [saved / (2 * d)] * d
        low = [saved / (2 * d)] * d
        pa = int(parent[a])
        if pa >= 0:
            walkd = dd - 1.0
            smin = smax = None
            while True:
                pan = base + pa
                cdp = int(cutdim[pan])
                go_left = x64[cdp] <= float(cutval[pan])
                sib = int(right[pan]) if go_left else int(left[pan])
                sbn = bbmin[base + sib]
                sbx = bbmax[base + sib]
                if smin is None:
                    smin = [float(v) for v in sbn]
                    smax = [float(v) for v in sbx]
                else:
                    smin = [min(smin[i], float(sbn[i])) for i in range(d)]
                    smax = [max(smax[i], float(sbx[i])) for i in range(d)]
                dh = [max(x64[i] - smax[i], 0.0) for i in range(d)]
                dl = [max(smin[i] - x64[i], 0.0) for i in range(d)]
                new_sum = 0.0
                dlt = 0.0
                for i in range(d):
                    new_sum += max(smax[i], x64[i]) - min(smin[i], x64[i])
                    dlt += dh[i] + dl[i]
                safe = max(new_sum, tiny)
                p = dlt / safe if new_sum > 0.0 else 0.0
                pos = p > 0.0
                if pos:
                    ns = 1.0 / (walkd + 1.0)
                    h = [(dh[i] / safe) * ns + (1.0 - p) * h[i] for i in range(d)]
                    low = [(dl[i] / safe) * ns + (1.0 - p) * low[i] for i in range(d)]
                nxt = int(parent[pan])
                walkd -= 1.0
                if not (pos and nxt >= 0):
                    break
                pa = nxt
            # h.sum() and low.sum() are SEPARATE row reductions in the
            # engine (h_e.sum(1) + l_e.sum(1)) — keep that add order
            th = 0.0
            tl = 0.0
            for i in range(d):
                th += h[i]
            for i in range(d):
                tl += low[i]
            tot = th + tl
            scale = saved / max(tot, 1e-300) if tot > 0.0 else 1.0
            h = [v * scale for v in h]
            low = [v * scale for v in low]
    else:
        saved = 1.0 / (dd + 1.0)
        h = [saved * dh[i] / sumnew for i in range(d)]
        low = [saved * dl[i] / sumnew for i in range(d)]
        up = int(parent[a])
        walkd = dd - 1.0
        while up >= 0:
            an = base + up
            bn = bbmin[an]
            bx = bbmax[an]
            dh = [max(x64[i] - float(bx[i]), 0.0) for i in range(d)]
            dl = [max(float(bn[i]) - x64[i], 0.0) for i in range(d)]
            dlt = 0.0
            rs = 0.0
            for i in range(d):
                dlt += dh[i] + dl[i]
                rs += float(np.float32(bx[i]) - np.float32(bn[i]))
            newr = rs + dlt
            safe = max(newr, tiny)
            p = dlt / safe if newr > 0.0 else 0.0
            if not p > 0.0:
                break
            ns = 1.0 / (walkd + 1.0)
            h = [(dh[i] / safe) * ns + (1.0 - p) * h[i] for i in range(d)]
            low = [(dl[i] / safe) * ns + (1.0 - p) * low[i] for i in range(d)]
            up = int(parent[an])
            walkd -= 1.0
    ltm = float(np.log2(np.float64(tm + 1.0)))
    return (
        np.array([v * ltm for v in h]),
        np.array([v * ltm for v in low]),
    )


def test_attribution_shadow_union_matches_reference_walk():
    """Regression for the round-5 shadow-box bug: the duplicate-leaf walk
    must accumulate the RUNNING union of sibling boxes (the reference's
    shadowBox.getMergedBox chain) — an `out=` on a fancy-indexed copy
    silently froze the union at level 0 and was caught by the C
    transcription. Both engine paths must equal the scalar reference
    transcription bit-for-bit, per tree, on a duplicate-heavy fixture."""
    rng = np.random.default_rng(123)
    d = 3
    X = np.round(rng.normal(0, 1, size=(900, d)), 0).astype(np.float32)
    f = RCFForest(d, num_trees=6, sample_size=64, time_decay=0.01, seed=11)
    f.update_batch(X)
    live = np.nonzero(f.root >= 0)[0]
    q = np.vstack([X[:25], rng.normal(0, 3, (5, d))]).astype(np.float32)
    checked_shadow = 0
    for qi in range(len(q)):
        for t in live:
            lanes = (np.array([0], np.int64), np.array([int(t)], np.int64))
            div = np.array([1])
            hi_c, lo_c = f.attribution(
                q[qi][None, :], _lanes=lanes, _per_row_div=div
            )
            hi_p, lo_p = _py_path(
                f.attribution, q[qi][None, :], _lanes=lanes, _per_row_div=div
            )
            hi_r, lo_r = _ref_attribution_tree(f, int(t), q[qi])
            np.testing.assert_array_equal(hi_c[0], hi_r)
            np.testing.assert_array_equal(lo_c[0], lo_r)
            np.testing.assert_array_equal(hi_p[0], hi_r)
            np.testing.assert_array_equal(lo_p[0], lo_r)
            checked_shadow += 1
    assert checked_shadow > 0


@settings(max_examples=8, deadline=None)
@given(
    n=st.integers(60, 700),
    d=st.integers(1, 9),
    k=st.sampled_from([16, 64, 128]),
    seed=st.integers(0, 99_999),
)
def test_density_lanes_bit_identical(n, d, k, seed):
    """C density walk (SimpleInterpolationVisitor analogue) vs the
    vectorized Python walk: all six DiVector accumulators plus the
    scalar density, on duplicate-heavy and far queries."""
    from random_cut_forest_by_aws_spark.core.queries import density

    rng = np.random.default_rng(seed)
    X = np.round(rng.normal(0, 1, size=(n, d)), 1).astype(np.float32)
    f = RCFForest(d, num_trees=6, sample_size=k, time_decay=0.01, seed=seed)
    f.update_batch(X)
    q = np.vstack([
        X[:15],                                   # duplicates (eq leaf)
        rng.normal(0, 1, (10, d)),
        rng.normal(0, 6, (8, d)),
    ]).astype(np.float32)
    rc = density(f, q)
    rp = _py_path(density, f, q)
    for key in rc:
        np.testing.assert_array_equal(rc[key], rp[key], err_msg=key)


def test_density_high_dim_pairwise_recursion():
    from random_cut_forest_by_aws_spark.core.queries import density

    rng = np.random.default_rng(79)
    d = 70
    X = rng.normal(0, 1, size=(300, d)).astype(np.float32)
    f = RCFForest(d, num_trees=4, sample_size=64, time_decay=0.0, seed=3)
    f.update_batch(X)
    q = np.vstack([X[:8], rng.normal(0, 4, (20, d))]).astype(np.float32)
    rc = density(f, q)
    rp = _py_path(density, f, q)
    for key in rc:
        np.testing.assert_array_equal(rc[key], rp[key], err_msg=key)
