"""Window-based shingling (ShingleBuilder analogue)."""

from __future__ import annotations

import numpy as np
import pytest

from random_cut_forest_by_aws_spark.functions.shingle import (
    flatten_vector_shingle,
    shingle_column,
)


def test_shingle_column_matches_numpy(spark):
    vals = [float(v) for v in range(20)]
    df = spark.createDataFrame(
        [(i, "g", v) for i, v in enumerate(vals)], "seq long, g string, v double"
    )
    out = (
        shingle_column(df, "v", "seq", ("g",), shingle_size=4)
        .orderBy("seq")
        .toPandas()
    )
    expect = np.lib.stride_tricks.sliding_window_view(np.array(vals), 4)
    assert len(out) == len(expect)
    for got, exp in zip(out["shingle"], expect):
        np.testing.assert_array_equal(np.asarray(got), exp)


def test_shingle_groups_are_independent(spark):
    rows = [(i, "a" if i % 2 == 0 else "b", float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "seq long, g string, v double")
    out = shingle_column(df, "v", "seq", ("g",), shingle_size=3).toPandas()
    for _, r in out.iterrows():
        sh = list(r["shingle"])
        assert all(b - a == 2.0 for a, b in zip(sh, sh[1:]))  # same-parity group


def test_flatten_vector_shingle(spark):
    rows = [(i, [float(i), float(i) + 0.5]) for i in range(5)]
    df = spark.createDataFrame(rows, "seq long, vec array<double>")
    out = flatten_vector_shingle(df, "vec", "seq", (), shingle_size=2).orderBy("seq").toPandas()
    assert len(out) == 4
    first = list(out.iloc[0]["shingle"])
    assert first == [0.0, 0.5, 1.0, 1.5]
