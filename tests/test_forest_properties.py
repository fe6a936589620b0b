"""Property-based invariants of the RCF core (hypothesis): structural
tree consistency and score-sanity under arbitrary update streams — the
class of bugs example-based tests miss (reference exercises these via
RandomCutTreeTest / forest ConsistencyTest sweeps)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from random_cut_forest_by_aws_spark.core.forest import _NULL, RCFForest


def _check_tree_structure(f: RCFForest, t: int) -> None:
    """Walk tree t and assert the flat-array invariants hold."""
    root = int(f.root[t])
    if root == _NULL:
        assert f.ssize[t] == 0
        return
    seen_leaf_mass = 0
    stack = [(root, _NULL)]
    n_nodes = 0
    while stack:
        node, parent = stack.pop()
        n_nodes += 1
        assert n_nodes <= f.N, "cycle or leak in tree topology"
        assert int(f.parent[t, node]) == parent
        if f.cutdim[t, node] < 0:  # leaf
            assert f.mass[t, node] >= 1
            seen_leaf_mass += int(f.mass[t, node])
            np.testing.assert_array_equal(f.bbmin[t, node], f.bbmax[t, node])
        else:
            ln, rn = int(f.left[t, node]), int(f.right[t, node])
            assert ln != _NULL and rn != _NULL
            # internal mass = sum of children
            assert f.mass[t, node] == f.mass[t, ln] + f.mass[t, rn]
            # bounding box = union of child boxes
            np.testing.assert_allclose(
                f.bbmin[t, node], np.minimum(f.bbmin[t, ln], f.bbmin[t, rn])
            )
            np.testing.assert_allclose(
                f.bbmax[t, node], np.maximum(f.bbmax[t, ln], f.bbmax[t, rn])
            )
            # the cut separates the children's boxes
            cd = int(f.cutdim[t, node])
            assert f.bbmax[t, ln][cd] <= f.cutval[t, node] < f.bbmin[t, rn][cd] \
                or f.bbmax[t, ln][cd] <= f.cutval[t, node]
            stack.append((ln, node))
            stack.append((rn, node))
    # root mass equals the sampler's live size (leaf masses count dups)
    assert seen_leaf_mass == int(f.ssize[t])
    assert int(f.mass[t, root]) == int(f.ssize[t])


@settings(max_examples=15, deadline=None)
@given(
    data=st.lists(
        st.lists(st.integers(-50, 50), min_size=2, max_size=2),
        min_size=5, max_size=300,
    ),
    dup_every=st.integers(2, 10),
    seed=st.integers(0, 10_000),
)
def test_tree_invariants_hold_under_any_stream(data, dup_every, seed):
    """After ANY update stream (including duplicates — integer coords
    force them), every tree satisfies: parent/child symmetry, mass
    additivity, box = union of child boxes, cut separates children,
    root mass == sampler size."""
    X = np.array(data, np.float32)
    X[::dup_every] = X[0]  # plant exact duplicates
    f = RCFForest(2, num_trees=4, sample_size=32, time_decay=0.01, seed=seed)
    f.update_batch(X)
    for t in range(f.T):
        _check_tree_structure(f, t)


@settings(max_examples=10, deadline=None)
@given(
    n=st.integers(50, 400),
    seed=st.integers(0, 10_000),
)
def test_scores_finite_positive_and_attribution_sums(n, seed):
    rng = np.random.default_rng(seed)
    X = rng.normal(0, 1, size=(n, 3)).astype(np.float32)
    f = RCFForest(3, num_trees=8, sample_size=64, time_decay=0.0, seed=seed)
    f.update_batch(X)
    q = np.vstack([X[:5], rng.normal(0, 5, size=(3, 3)).astype(np.float32)])
    s = f.score(q)
    assert np.all(np.isfinite(s)) and np.all(s >= 0)
    hi, lo = f.attribution(q)
    # 1e-6: score and attribution accumulate the walk-up in different
    # association orders (attribution splits p·unseen into high/low parts)
    np.testing.assert_allclose((hi + lo).sum(1), s, rtol=1e-6)
    assert np.all(hi >= -1e-12) and np.all(lo >= -1e-12)


@settings(max_examples=10, deadline=None)
@given(seed=st.integers(0, 10_000), k=st.integers(8, 64))
def test_checkpoint_roundtrip_is_lossless(seed, k):
    """to_state → from_state must reproduce scores bit-exactly and keep
    accepting updates identically."""
    rng = np.random.default_rng(seed)
    X = rng.normal(0, 1, size=(300, 2)).astype(np.float32)
    f = RCFForest(2, num_trees=5, sample_size=k, time_decay=0.005, seed=seed)
    f.update_batch(X[:200], seqs=np.arange(200))
    g = RCFForest.from_state(f.to_state())
    q = X[:50]
    np.testing.assert_array_equal(f.score(q), g.score(q))
    f.update_batch(X[200:], seqs=np.arange(200, 300))
    g.update_batch(X[200:], seqs=np.arange(200, 300))
    np.testing.assert_array_equal(f.score(q), g.score(q))
    for t in range(f.T):
        _check_tree_structure(f, t)
        _check_tree_structure(g, t)
