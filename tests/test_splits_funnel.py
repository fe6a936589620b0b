"""Deterministic split assignment + single-scan filter funnel."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from random_cut_forest_by_aws_spark.operators.funnel import filter_funnel
from random_cut_forest_by_aws_spark.operators.splits import assign_splits

SPLITS = {"train": 0.75, "val": 0.125, "test": 0.125}


def _docs(spark, n=4000, k=1):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("grp"),
        (F.col("id") * k).alias("payload"),
    )


def test_split_exhaustive_and_proportional(spark):
    out = assign_splits(_docs(spark), SPLITS).groupBy("split").count()
    counts = {r["split"]: r["count"] for r in out.collect()}
    assert set(counts) == set(SPLITS)
    assert sum(counts.values()) == 4000
    for name, frac in SPLITS.items():
        assert abs(counts[name] / 4000 - frac) < 0.03, (name, counts)


def test_split_stable_under_corpus_growth(spark):
    """THE property rank/RNG splitters fail: a doc's split never moves
    when other docs are added — eval sets stay frozen across backfills."""
    small = assign_splits(_docs(spark, 500), SPLITS)
    big = assign_splits(_docs(spark, 4000), SPLITS)
    joined = small.select("doc_id", F.col("split").alias("s1")).join(
        big.select("doc_id", F.col("split").alias("s2")), "doc_id"
    )
    assert joined.filter(F.col("s1") != F.col("s2")).count() == 0
    assert joined.count() == 500


def test_split_group_cohesion(spark):
    """group_col keys the hash on the group: near-duplicate clusters /
    same-domain docs cannot straddle train and test."""
    out = assign_splits(_docs(spark), SPLITS, group_col="grp")
    per_group = out.groupBy("grp").agg(
        F.countDistinct("split").alias("n_splits")
    )
    assert per_group.filter(F.col("n_splits") > 1).count() == 0
    # while the plain keying does split within groups
    plain = assign_splits(_docs(spark), SPLITS)
    assert (
        plain.groupBy("grp")
        .agg(F.countDistinct("split").alias("n"))
        .filter(F.col("n") > 1)
        .count()
        > 0
    )


def test_split_validation_errors(spark):
    df = _docs(spark, 10)
    with pytest.raises(ValueError):
        assign_splits(df, {"train": 0.9, "val": 0.2})  # sums to 1.1
    with pytest.raises(ValueError):
        assign_splits(df, {"train": 1.0})  # single split
    with pytest.raises(ValueError):
        assign_splits(df, {"train": 1.1, "val": -0.1})  # negative


STAGES = [
    ("nonneg", "payload >= 0"),
    ("small", "payload < 300"),
    ("even", "payload % 2 = 0"),
]


def test_funnel_first_fail_accounting(spark):
    df = spark.range(-50, 450).select(F.col("id").alias("payload"))
    survivors, report = filter_funnel(df, STAGES)
    rep = {r["stage"]: r for r in report.collect()}
    # -50..-1 die at nonneg; 300..449 die at small; odds of 0..299 at even
    assert rep["nonneg"]["dropped"] == 50
    assert rep["small"]["dropped"] == 150
    assert rep["even"]["dropped"] == 150
    assert rep["nonneg"]["remaining"] == 450
    assert rep["small"]["remaining"] == 300
    assert rep["even"]["remaining"] == 150
    assert survivors.count() == 150
    assert [r["stage_idx"] for r in report.orderBy("stage_idx").collect()] == [1, 2, 3]


def test_funnel_null_predicate_is_failure(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, -5)], "doc_id long, payload int"
    )
    survivors, report = filter_funnel(df, [("nonneg", "payload >= 0")])
    rep = report.collect()[0]
    assert rep["dropped"] == 2  # the NULL row fails, not passes
    assert rep["remaining"] == 1
    assert [r["doc_id"] for r in survivors.collect()] == [1]


def test_funnel_report_is_single_scan(spark, tmp_path):
    """The report's total derives from the same aggregate (exchange
    reuse), not a second count() scan — one FileScan in the executed
    plan."""
    p = str(tmp_path / "docs.parquet")
    _docs(spark, 2000).write.parquet(p)
    df = spark.read.parquet(p)
    _, report = filter_funnel(df, STAGES)
    report.collect()
    plan = report._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]  # AQE echoes the pre-plan
    n_scans = plan.count("FileScan parquet")
    assert n_scans == 1, plan
    # and exactly one exchange: the single-row partial aggregate
    assert plan.count("Exchange") - plan.count("ReusedExchange") <= 1, plan


def test_funnel_validation(spark):
    df = _docs(spark, 10)
    with pytest.raises(ValueError):
        filter_funnel(df, [])
    with pytest.raises(ValueError):
        filter_funnel(df, [("a", "payload >= 0"), ("a", "payload < 5")])


def test_split_null_key_gets_null_split(spark):
    """A NULL key must yield a NULL split, never a silent default — a
    NULL hash would otherwise skip every WHEN and contaminate the last
    split (review finding)."""
    df = spark.createDataFrame(
        [(1,), (None,), (3,)], "doc_id long"
    )
    out = assign_splits(df, SPLITS)
    rows = {r["doc_id"]: r["split"] for r in out.collect()}
    assert rows[None] is None
    assert rows[1] in SPLITS and rows[3] in SPLITS


def test_funnel_empty_input_reports_zeros(spark):
    df = spark.createDataFrame([], "payload long")
    _, report = filter_funnel(df, STAGES)
    for r in report.collect():
        assert r["dropped"] == 0
        assert r["remaining"] == 0
