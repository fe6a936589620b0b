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


def test_cyclic_shingle_column_layout(spark):
    """Cyclic mode (ShingleBuilder.java:27-48): a new value overwrites
    the OLDEST slot in place — abcd → ebcd → efcd."""
    import pandas as pd

    from random_cut_forest_by_aws_spark.functions.shingle import shingle_column

    df = spark.createDataFrame(
        pd.DataFrame({"t": range(6), "v": [10.0, 11.0, 12.0, 13.0, 14.0, 15.0]})
    )
    out = (
        shingle_column(df, "v", "t", shingle_size=4, cyclic=True)
        .orderBy("t")
        .toPandas()
    )
    # t=3: first full shingle = abcd; t=4: e overwrites slot 0; t=5: slot 1
    got = [list(map(float, v)) for v in out["shingle"]]
    assert got == [
        [10.0, 11.0, 12.0, 13.0],
        [14.0, 11.0, 12.0, 13.0],
        [14.0, 15.0, 12.0, 13.0],
    ]


def test_extrapolate_cyclic_matches_sliding_on_seasonal():
    """Sliding vs cyclic extrapolation on a seasonal series: a forest
    trained on cyclic (rotated) shingles forecasts the same future values
    as the sliding-trained forest (extrapolateBasicCyclic,
    RandomCutForest.java:1192-1258)."""
    import numpy as np

    from random_cut_forest_by_aws_spark.core.forest import RCFForest
    from random_cut_forest_by_aws_spark.core.queries import extrapolate

    s, n = 8, 2048
    series = np.sin(2 * np.pi * np.arange(n + 16) / s)  # period == shingle
    sliding = np.lib.stride_tricks.sliding_window_view(series[:n], s)
    f_slide = RCFForest(s, num_trees=30, sample_size=128, time_decay=0.0, seed=5)
    f_slide.update_batch(sliding.astype(np.float32))
    # cyclic layout: value at tick t lands in slot t % s
    t_last = n - 1
    cyc = np.empty_like(sliding)
    for i in range(len(sliding)):
        t = i + s - 1
        r = (t + 1) % s
        cyc[i] = np.concatenate([sliding[i, s - r:], sliding[i, :s - r]])
    f_cyc = RCFForest(s, num_trees=30, sample_size=128, time_decay=0.0, seed=5)
    f_cyc.update_batch(cyc.astype(np.float32))

    horizon = 6
    fc_s = extrapolate(f_slide, sliding[-1], horizon, seed=1)
    fc_c = extrapolate(
        f_cyc, cyc[-1], horizon, seed=1, cyclic=True,
        shingle_index=(t_last + 1) % s,
    )
    truth = series[n : n + horizon]
    np.testing.assert_allclose(fc_s["values"], truth, atol=0.15)
    np.testing.assert_allclose(fc_c["values"], truth, atol=0.15)
    np.testing.assert_allclose(fc_c["values"], fc_s["values"], atol=0.2)
