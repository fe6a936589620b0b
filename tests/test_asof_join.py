"""Distributed as-of join vs pandas merge_asof (the reference semantics:
backward, inclusive on exact timestamp matches, optional tolerance)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from random_cut_forest_by_aws_spark.operators.joins import asof_join


def _frames(seed: int, n_left: int = 400, n_right: int = 150):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2026-01-01")
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 7, n_left),
            "t": base + pd.to_timedelta(rng.integers(0, 100_000, n_left), unit="s"),
            "lval": rng.normal(size=n_left).round(3),
        }
    )
    right = pd.DataFrame(
        {
            "rk": rng.integers(0, 9, n_right),  # keys 7,8 never match left
            "rt": base + pd.to_timedelta(rng.integers(0, 100_000, n_right), unit="s"),
            "rv": rng.normal(size=n_right).round(3),
        }
    )
    # as-of contract: one right row per (key, ts)
    right = right.drop_duplicates(["rk", "rt"]).reset_index(drop=True)
    # plant exact-timestamp ties to pin the inclusive (>=) semantics
    ties = left.iloc[:5].copy()
    right = pd.concat(
        [right, pd.DataFrame({"rk": ties["k"], "rt": ties["t"], "rv": 99.5})],
        ignore_index=True,
    ).drop_duplicates(["rk", "rt"], keep="first").reset_index(drop=True)
    return left, right


def _reference(left, right, tolerance=None):
    kw = {"tolerance": pd.Timedelta(tolerance)} if tolerance else {}
    return pd.merge_asof(
        left.sort_values("t").reset_index(drop=True),
        right.sort_values("rt").reset_index(drop=True),
        left_on="t",
        right_on="rt",
        left_by="k",
        right_by="rk",
        direction="backward",
        allow_exact_matches=True,
        **kw,
    )


def _canon(df):
    return (
        df.sort_values(["k", "t", "lval"])
        .reset_index(drop=True)[["k", "t", "lval", "rv"]]
    )


@pytest.mark.parametrize("seed", [1, 2])
def test_asof_join_matches_merge_asof(spark, seed):
    left, right = _frames(seed)
    got = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        key_left="k", key_right="rk", ts_left="t", ts_right="rt",
        value_cols=["rv"],
    ).toPandas()
    ref = _reference(left, right)
    g, r = _canon(got), _canon(ref)
    pd.testing.assert_frame_equal(g, r, check_dtype=False)
    # the planted exact-ts ties must have matched inclusively
    assert (r["rv"] == 99.5).any()
    # and some left rows genuinely have no earlier right row
    assert r["rv"].isna().any()


def test_asof_join_tolerance(spark):
    left, right = _frames(3)
    got = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        key_left="k", key_right="rk", ts_left="t", ts_right="rt",
        value_cols=["rv"],
        tolerance="2 hours",
    ).toPandas()
    ref = _reference(left, right, tolerance="2 hours")
    pd.testing.assert_frame_equal(_canon(got), _canon(ref), check_dtype=False)
    # tolerance must actually null out stale matches vs the unbounded join
    ref_unbounded = _reference(left, right)
    assert ref["rv"].isna().sum() > ref_unbounded["rv"].isna().sum()


def test_asof_join_null_keys_and_timestamps_never_match(spark):
    """SQL equality semantics: null keys/timestamps match nothing — unlike
    a naive Spark window, which groups null keys into one partition."""
    base = pd.Timestamp("2026-01-01")
    left = pd.DataFrame(
        {
            "k": pd.array([1, 1, None, 2], dtype="Int64"),
            "t": [base, pd.NaT, base, base],
            "lval": [1.0, 2.0, 3.0, 4.0],
        }
    )
    right = pd.DataFrame(
        {
            "rk": pd.array([1, None, 2], dtype="Int64"),
            "rt": [base - pd.Timedelta("1 hour"), base - pd.Timedelta("1 hour"), pd.NaT],
            "rv": [10.0, 20.0, 30.0],
        }
    )
    got = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        key_left="k", key_right="rk", ts_left="t", ts_right="rt",
        value_cols=["rv"],
    ).toPandas().sort_values("lval").reset_index(drop=True)
    # row 0: k=1, valid ts -> matches rv=10
    # row 1: k=1, null ts  -> no match
    # row 2: null key      -> no match (right's null-key row must not fill it)
    # row 3: k=2           -> right's only k=2 row has null ts -> no match
    assert got.loc[0, "rv"] == 10.0
    assert pd.isna(got.loc[1, "rv"])
    assert pd.isna(got.loc[2, "rv"])
    assert pd.isna(got.loc[3, "rv"])


def test_asof_join_preserves_left_rowcount_and_schema(spark):
    left, right = _frames(4, n_left=50, n_right=20)
    ldf = spark.createDataFrame(left)
    out = asof_join(
        ldf, spark.createDataFrame(right),
        key_left="k", key_right="rk", ts_left="t", ts_right="rt",
        value_cols=["rv"],
    )
    assert out.count() == len(left)
    assert out.columns == ldf.columns + ["rv"]
