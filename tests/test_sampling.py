"""quota_sample / token_budget_sample: pandas reference parity,
bucket invariance (two-phase exactness), small groups, determinism."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from random_cut_forest_by_aws_spark.operators.mixing import _KNUTH, _M
from random_cut_forest_by_aws_spark.operators.sampling import (
    quota_sample,
    token_budget_sample,
)

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


def _token_fixture():
    rng = np.random.default_rng(7)
    pdf = _fixture()
    pdf["n_tok"] = rng.integers(1, 400, len(pdf)).astype("int64")
    return pdf


def _budget_reference(pdf, budget):
    """Greedy prefix per key in (hash, id) order: keep rows whose
    cumulative weight BEFORE them is < budget."""
    pdf = pdf.copy()
    pdf["_qh"] = (pdf["doc_id"] % _M * _KNUTH + SEED) % _M
    out = []
    for key, grp in pdf.groupby("source"):
        b = budget[key] if isinstance(budget, dict) else budget
        grp = grp.sort_values(["_qh", "doc_id"]).copy()
        grp["tokens_before"] = grp["n_tok"].cumsum() - grp["n_tok"]
        out.append(grp[grp["tokens_before"] < b].drop(columns="_qh"))
    return (
        pd.concat(out).sort_values(["source", "doc_id"]).reset_index(drop=True)
    )


@pytest.mark.parametrize("n_buckets", [1, 2, 7, 64])
def test_token_budget_matches_reference_any_bucketing(spark, n_buckets):
    """The hierarchical prefix sum must equal the single-pass cumulative
    reference for ANY range-bucket granularity — bucket offsets + local
    windows compose to the exact global prefix."""
    pdf = _token_fixture()
    got = (
        token_budget_sample(
            spark.createDataFrame(pdf), 3_000, "n_tok", n_buckets=n_buckets
        )
        .toPandas()
        .astype({"doc_id": "int64", "tokens_before": "int64"})
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    exp = _budget_reference(pdf, 3_000)
    pd.testing.assert_frame_equal(
        got[["source", "doc_id", "n_tok", "tokens_before"]],
        exp[["source", "doc_id", "n_tok", "tokens_before"]].astype(
            {"tokens_before": "int64"}
        ),
        check_dtype=False,
    )


def test_token_budget_overshoot_bounded(spark):
    """Realized totals reach the budget and overshoot by less than one
    document (the greedy-prefix contract)."""
    pdf = _token_fixture()
    got = token_budget_sample(
        spark.createDataFrame(pdf), 3_000, "n_tok"
    ).toPandas()
    totals = got.groupby("source")["n_tok"].sum()
    group_tot = pdf.groupby("source")["n_tok"].sum()
    for key, tot in totals.items():
        if group_tot[key] >= 3_000:
            assert tot >= 3_000  # budget reached
            # the boundary doc is included, nothing after it
            assert tot - got[got["source"] == key]["n_tok"].max() < 3_000
        else:
            assert tot == group_tot[key]  # small groups kept whole


def test_token_budget_per_key_dict_and_nulls(spark):
    """Per-key budgets honored; unlisted keys dropped at default 0; NULL
    weights count as 0 (ride inside the prefix for free)."""
    pdf = _token_fixture()
    budget = {"web": 1_000, "books": 100_000}
    got = token_budget_sample(
        spark.createDataFrame(pdf), budget, "n_tok", n_buckets=7
    ).toPandas()
    exp = _budget_reference(pdf, {**budget, "code": 0, "tiny": 0})
    assert set(got["doc_id"]) == set(exp["doc_id"])
    assert set(got["source"]) == {"web", "books"}  # code/tiny dropped
    # NULL weight: kept for free, does not advance the prefix
    pdf2 = pdf.copy()
    pdf2.loc[pdf2.index[:5], "n_tok"] = None
    got2 = token_budget_sample(
        spark.createDataFrame(pdf2), 3_000, "n_tok"
    ).toPandas()
    pdf2_zero = pdf2.copy()
    pdf2_zero["n_tok"] = pdf2_zero["n_tok"].fillna(0).astype("int64")
    exp2 = _budget_reference(pdf2_zero, 3_000)
    assert set(got2["doc_id"]) == set(exp2["doc_id"])


def test_token_budget_validation(spark):
    df = spark.createDataFrame(_token_fixture())
    with pytest.raises(ValueError):
        token_budget_sample(df, 0, "n_tok")
    with pytest.raises(ValueError):
        token_budget_sample(df, {"web": -1}, "n_tok")
    with pytest.raises(ValueError):
        token_budget_sample(df, 100, "n_tok", n_buckets=0)
