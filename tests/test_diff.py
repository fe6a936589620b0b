"""snapshot_diff: row-level reconciliation semantics + plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from random_cut_forest_by_aws_spark.operators.diff import (
    snapshot_diff,
    snapshot_diff_summary,
)

SCHEMA = "id bigint, grp string, val bigint, txt string"


@pytest.fixture(scope="module")
def snaps(spark):
    base = spark.createDataFrame(
        [
            (1, "a", 10, "same"),          # unchanged
            (2, "a", 20, "old"),           # changed: txt
            (3, "b", 30, "gone"),          # removed
            (4, "b", None, "nullsame"),    # unchanged with NULL val
            (5, "b", 50, None),            # changed: txt NULL -> value
            (6, "c", 60, "dup"),           # duplicate on base side
            (6, "c", 61, "dup2"),
            (8, "c", 80, "two"),           # changed: val AND txt
            (None, "d", 90, "nullkey"),    # NULL key, changed: val
        ],
        SCHEMA,
    )
    curr = spark.createDataFrame(
        [
            (1, "a", 10, "same"),
            (2, "a", 20, "new"),
            (4, "b", None, "nullsame"),
            (5, "b", 50, "filled"),
            (6, "c", 60, "dup"),
            (7, "c", 70, "fresh"),         # added
            (8, "c", 81, "two2"),
            (None, "d", 91, "nullkey"),
        ],
        SCHEMA,
    )
    return base, curr


def _by_id(df):
    return {r["id"]: r for r in df.collect()}


def test_statuses_and_changed_cols(spark, snaps):
    base, curr = snaps
    got = _by_id(snapshot_diff(base, curr, "id"))
    assert 1 not in got  # unchanged excluded by default
    assert 4 not in got  # NULL == NULL is not a change
    assert got[2]["status"] == "changed"
    assert got[2]["changed_cols"] == "txt"
    assert got[3]["status"] == "removed"
    assert got[5]["status"] == "changed"          # NULL -> value
    assert got[5]["changed_cols"] == "txt"
    assert got[6]["status"] == "duplicate_key"
    assert got[6]["changed_cols"] == ""
    assert (got[6]["cnt_base"], got[6]["cnt_curr"]) == (2, 1)
    assert got[7]["status"] == "added"
    assert got[8]["status"] == "changed"
    assert got[8]["changed_cols"] == "val,txt"    # base column order
    assert got[None]["status"] == "changed"       # NULL key is a key
    assert got[None]["changed_cols"] == "val"


def test_include_unchanged_and_compare_subset(spark, snaps):
    base, curr = snaps
    got = _by_id(snapshot_diff(base, curr, "id", include_unchanged=True))
    assert got[1]["status"] == "unchanged"
    assert got[1]["changed_cols"] == ""
    # comparing only val: the txt-only changes become unchanged
    sub = _by_id(snapshot_diff(base, curr, "id", compare_cols=["val"]))
    assert 2 not in sub and 5 not in sub
    assert sub[8]["changed_cols"] == "val"


def test_multi_column_key(spark, snaps):
    base, curr = snaps
    got = snapshot_diff(base, curr, ["id", "grp"],
                        include_unchanged=True).collect()
    by_key = {(r["id"], r["grp"]): r["status"] for r in got}
    assert by_key[(2, "a")] == "changed"
    assert by_key[(6, "c")] == "duplicate_key"


def test_summary_counts(spark, snaps):
    base, curr = snaps
    s = {r["status"]: r for r in
         snapshot_diff_summary(base, curr, "id").collect()}
    assert s["unchanged"]["n_keys"] == 2
    assert s["changed"]["n_keys"] == 4
    assert s["added"]["n_keys"] == 1
    assert s["removed"]["n_keys"] == 1
    assert s["duplicate_key"]["n_keys"] == 1
    assert s["duplicate_key"]["rows_base"] == 2
    total_base = sum(r["rows_base"] for r in s.values())
    assert total_base == base.count()


def test_single_exchange_no_join(spark, snaps):
    """The diff is one union + one aggregate: exactly one shuffle
    exchange, no join operator, and the payload never shuffles (the
    exchange carries only keys + hashes)."""
    base, curr = snaps
    d = snapshot_diff(base, curr, "id")
    d.collect()
    plan = d._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]  # AQE prints both
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan
    # the payload column feeds xxhash64 below the exchange; nothing
    # above the exchange (printed before it: parents first) may
    # reference the raw string attribute (the __h*_txt hash attributes
    # legitimately appear — hence the lookbehind)
    import re
    above = plan.split("Exchange hashpartitioning", 1)[0]
    assert not re.search(r"(?<![_a-z])txt#", above), plan
