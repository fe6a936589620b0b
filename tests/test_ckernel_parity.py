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
    # queries on the identical state agree bit-for-bit
    q = rng.normal(0, 2, size=(25, d)).astype(np.float32)
    np.testing.assert_array_equal(fc.score(q), fp.score(q))


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
