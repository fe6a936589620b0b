"""quota_sample: pandas reference parity, salt-bucket invariance
(two-phase top-K exactness), small groups, determinism."""

from __future__ import annotations

import pandas as pd
import pytest

from random_cut_forest_by_aws_spark.operators.mixing import _KNUTH, _M
from random_cut_forest_by_aws_spark.operators.sampling import quota_sample

SEED = 42


def _fixture():
    rows = []
    for key, n in [("web", 57), ("books", 9), ("code", 3), ("tiny", 1)]:
        for i in range(n):
            rows.append((key, hash((key, i)) % 100_000 + i * 100_000))
    return pd.DataFrame(rows, columns=["source", "doc_id"]).drop_duplicates(
        "doc_id"
    )


def _reference(pdf, quota):
    pdf = pdf.copy()
    pdf["_qh"] = (pdf["doc_id"] % _M * _KNUTH + SEED) % _M
    out = []
    for key, grp in pdf.groupby("source"):
        grp = grp.sort_values(["_qh", "doc_id"]).head(quota).copy()
        grp["sample_rank"] = range(1, len(grp) + 1)
        out.append(grp.drop(columns="_qh"))
    return (
        pd.concat(out)
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("salt_buckets", [1, 2, 7, 64])
def test_matches_reference_any_bucketing(spark, salt_buckets):
    """The two-phase top-K must equal the single-pass reference for any
    salt granularity — the union-of-bucket-top-Ks containment is what
    makes the scale path exact."""
    pdf = _fixture()
    got = (
        quota_sample(
            spark.createDataFrame(pdf), 10, salt_buckets=salt_buckets
        )
        .toPandas()
        .astype({"doc_id": "int64", "sample_rank": "int64"})
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["source", "doc_id", "sample_rank"]],
        _reference(pdf, 10)[["source", "doc_id", "sample_rank"]],
        check_dtype=False,
    )


def test_small_groups_kept_whole(spark):
    pdf = _fixture()
    got = quota_sample(spark.createDataFrame(pdf), 10).toPandas()
    counts = got.groupby("source").size()
    assert counts["web"] == 10
    assert counts["books"] == 9
    assert counts["code"] == 3
    assert counts["tiny"] == 1
    # ranks are 1..n within each key
    for key, grp in got.groupby("source"):
        assert sorted(grp["sample_rank"]) == list(range(1, len(grp) + 1))


def test_deterministic_and_stable_under_growth(spark):
    """Reruns pick identical rows; adding documents only displaces
    existing picks (survivors keep identical relative order)."""
    pdf = _fixture()
    df = spark.createDataFrame(pdf)
    a = set(quota_sample(df, 5).toPandas()["doc_id"])
    b = set(quota_sample(df, 5).toPandas()["doc_id"])
    assert a == b
    grown = pd.concat(
        [pdf, pd.DataFrame([("web", 999_999_937)], columns=pdf.columns)]
    )
    c = quota_sample(spark.createDataFrame(grown), 5).toPandas()
    kept_both = set(c["doc_id"]) & a
    # previously-selected rows that survive keep a consistent hash order
    assert len(kept_both) >= 4


def test_per_key_quota_dict(spark):
    """Dict quotas: per-key caps honored exactly, unlisted keys get the
    default (0 = dropped entirely)."""
    pdf = _fixture()
    df = spark.createDataFrame(pdf)
    got = quota_sample(
        df, {"web": 4, "books": 2}, salt_buckets=7
    ).toPandas()
    counts = got.groupby("source").size().to_dict()
    assert counts == {"web": 4, "books": 2}  # code/tiny dropped (default 0)
    # the selected rows are each key's global top-k under the hash order
    for key, k in [("web", 4), ("books", 2)]:
        exp = _reference(pdf[pdf["source"] == key], k)
        assert set(got.loc[got["source"] == key, "doc_id"]) == set(exp["doc_id"])
    # default_quota keeps unlisted keys at the default cap
    got2 = quota_sample(df, {"web": 4}, default_quota=1).toPandas()
    c2 = got2.groupby("source").size().to_dict()
    assert c2 == {"web": 4, "books": 1, "code": 1, "tiny": 1}


def test_validation(spark):
    df = spark.createDataFrame(_fixture())
    with pytest.raises(ValueError):
        quota_sample(df, 0)
    with pytest.raises(ValueError):
        quota_sample(df, 5, salt_buckets=0)
    with pytest.raises(ValueError):
        quota_sample(df, {"web": -1})
