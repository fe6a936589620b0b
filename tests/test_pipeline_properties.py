"""Property-based checks for the corpus-shaping operators: random
corpora vs the pure-Python references (hypothesis), following the
forest-properties conventions (small max_examples — each example runs a
Spark job)."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from random_cut_forest_by_aws_spark.operators.packing import pack_sequences
from random_cut_forest_by_aws_spark.operators.sampling import quota_sample
from test_packing import _reference_pack
from test_sampling import _reference as _reference_quota

_corpus = st.lists(
    st.tuples(
        st.sampled_from(["web", "books", "code"]),
        st.integers(0, 500),           # doc ids (deduped below)
        st.integers(0, 30),            # n_tok, zeros included
    ),
    min_size=1,
    max_size=60,
)


def _dedupe_ids(rows):
    seen, out = set(), []
    for key, did, n in rows:
        if did not in seen:
            seen.add(did)
            out.append((key, did, n))
    return out


@settings(max_examples=8, deadline=None)
@given(rows=_corpus, budget=st.integers(1, 25),
       bucket_width=st.sampled_from([1, 3, 17, 1 << 30]))
def test_pack_matches_reference(spark, rows, budget, bucket_width):
    docs = _dedupe_ids(rows)
    pdf = pd.DataFrame(docs, columns=["source", "doc_id", "n_tok"])
    got = (
        pack_sequences(
            spark.createDataFrame(pdf), budget, "n_tok",
            bucket_width=bucket_width,
        )
        .toPandas()
        .astype({c: "int64" for c in
                 ("doc_id", "n_tok", "pack_id", "tok_begin", "tok_end")})
        .sort_values(["source", "doc_id", "pack_id"])
        .reset_index(drop=True)
    )
    exp = _reference_pack(docs, budget)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@settings(max_examples=8, deadline=None)
@given(rows=_corpus, quota=st.integers(1, 12),
       salt_buckets=st.sampled_from([1, 2, 7, 64]))
def test_quota_matches_reference(spark, rows, quota, salt_buckets):
    docs = _dedupe_ids(rows)
    pdf = pd.DataFrame(
        [(k, d) for k, d, _ in docs], columns=["source", "doc_id"]
    )
    got = (
        quota_sample(spark.createDataFrame(pdf), quota,
                     salt_buckets=salt_buckets)
        .toPandas()
        .astype({"doc_id": "int64", "sample_rank": "int64"})
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    exp = _reference_quota(pdf, quota)
    pd.testing.assert_frame_equal(
        got[["source", "doc_id", "sample_rank"]],
        exp[["source", "doc_id", "sample_rank"]],
        check_dtype=False,
    )


@settings(max_examples=15, deadline=None)
@given(
    vals=st.lists(st.integers(-50, 400), min_size=1, max_size=60),
    b1=st.integers(-10, 100),
    b2=st.integers(50, 350),
)
def test_funnel_matches_python_replay(spark, vals, b1, b2):
    """Property: funnel accounting == a plain Python replay of the
    first-failing-stage rule for arbitrary data and bounds."""
    from random_cut_forest_by_aws_spark.operators.funnel import filter_funnel

    stages = [("lo", f"payload >= {b1}"), ("hi", f"payload < {b2}")]
    df = spark.createDataFrame([(v,) for v in vals], "payload long")
    survivors, report = filter_funnel(df, stages)
    rep = {r["stage"]: r for r in report.collect()}

    d_lo = sum(1 for v in vals if not v >= b1)
    d_hi = sum(1 for v in vals if v >= b1 and not v < b2)
    assert rep["lo"]["dropped"] == d_lo
    assert rep["hi"]["dropped"] == d_hi
    assert rep["lo"]["remaining"] == len(vals) - d_lo
    assert rep["hi"]["remaining"] == len(vals) - d_lo - d_hi
    assert survivors.count() == len(vals) - d_lo - d_hi


# ------------------------------------------------------------- winnowing
_alpha = "abcdefghijklmnopqrstuvwxyz .!é"


@settings(max_examples=8, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.text(_alpha, min_size=0, max_size=120),   # a context
            st.text(_alpha, min_size=0, max_size=120),   # b context
            st.text(_alpha, min_size=12, max_size=30),   # shared core
            st.integers(0, 120),                          # a insert pos
            st.integers(0, 120),                          # b insert pos
        ),
        min_size=1,
        max_size=6,
    )
)
def test_winnow_guarantee_property(spark, data):
    """The winnowing CONTRACT, fuzzed: any two docs sharing a substring
    of >= window+k-1 = 12 chars share at least one fingerprint VALUE,
    and every doc's fingerprint set equals the scalar reference exactly
    (both impls — the arrow default is what the gate runs)."""
    from random_cut_forest_by_aws_spark.operators.dedup import winnow_fingerprints
    from test_dedup import _py_winnow

    rows = []
    for i, (a, b, core, pa, pb) in enumerate(data):
        rows.append((2 * i, a[:pa] + core + a[pa:]))
        rows.append((2 * i + 1, b[:pb] + core + b[pb:]))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = winnow_fingerprints(df).toPandas()
    by_doc = got.groupby("doc_id")["fp"].apply(set).to_dict()
    for doc_id, text in rows:
        assert by_doc.get(doc_id, set()) == _py_winnow(text), f"doc {doc_id}"
    for i in range(len(data)):
        assert by_doc[2 * i] & by_doc[2 * i + 1], f"pair {i}: no shared fp"
