"""Constraint suggestion (operators/suggest.py): profile-derived rules,
the closed loop back through Check, and drift detection on a changed
snapshot."""

from __future__ import annotations

import pytest

from random_cut_forest_by_aws_spark.operators.suggest import (
    VALUE_SEP,
    check_from_suggestions,
    suggest_rules,
)

SCHEMA = "id bigint, score bigint, lang string, note string"
ROWS = [
    (1, 10, "en", "alpha"),
    (2, 20, "de", None),
    (3, 30, "en", "gamma"),
    (4, 40, "fr", "delta"),
    (5, -5, "en", "epsilon"),
]


@pytest.fixture(scope="module")
def base(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def _by_rule(sugg):
    return {(r["column"], r["rule"]): r for r in sugg.collect()}


def test_suggested_rules_content(base):
    got = _by_rule(suggest_rules(base, max_categories=3))
    # id: complete, bounded, non-negative, unique — and NOT categorical
    assert got[("id", "is_complete")]["threshold"] == 1.0
    assert got[("id", "has_min")]["threshold"] == 1.0
    assert got[("id", "has_max")]["threshold"] == 5.0
    assert ("id", "is_non_negative") in got
    assert ("id", "is_unique") in got
    # score: min is negative -> range rules but no non-negative
    assert got[("score", "has_min")]["threshold"] == -5.0
    assert got[("score", "has_max")]["threshold"] == 40.0
    assert ("score", "is_non_negative") not in got
    # lang: 3 distinct <= max_categories -> contained_in, sorted values
    assert got[("lang", "is_contained_in")]["allowed"] == VALUE_SEP.join(
        ["de", "en", "fr"]
    )
    # note: one NULL -> has_completeness at floor4(0.8), never is_complete
    assert ("note", "is_complete") not in got
    assert got[("note", "has_completeness")]["threshold"] == 0.8
    assert got[("note", "has_completeness")]["metric"] == pytest.approx(0.8)
    # note is not fully complete -> no uniqueness proposal
    assert ("note", "is_unique") not in got


def test_unique_column_not_categorical(spark):
    """A fully-distinct complete string column proposes is_unique, not a
    5000-value is_contained_in."""
    df = spark.createDataFrame(
        [(i, f"k{i}") for i in range(10)], "id bigint, key string"
    )
    got = _by_rule(suggest_rules(df, max_categories=32))
    assert ("key", "is_unique") in got
    assert ("key", "is_contained_in") not in got


def test_closed_loop_passes_on_source_snapshot(base):
    sugg = suggest_rules(base, max_categories=3)
    verdicts = check_from_suggestions(sugg, "loop").run(base).collect()
    assert verdicts and all(v["passed"] for v in verdicts)


def test_suggested_check_flags_changed_snapshot(spark, base):
    sugg = suggest_rules(base, max_categories=3)
    chk = check_from_suggestions(sugg, "loop")
    tomorrow = spark.createDataFrame(
        ROWS + [
            (6, 99, "zz", "zeta"),     # domain growth + above max
            (6, None, "en", None),     # dup key + new null
        ],
        SCHEMA,
    )
    verdicts = {v["constraint"]: v["passed"] for v in chk.run(tomorrow).collect()}
    assert not verdicts["contained(lang)"]
    assert not verdicts["max(score)<="]
    assert not verdicts["distinctness(id)>="]
    assert not verdicts["complete(score)"]
    # untouched invariants still hold
    assert verdicts["min(score)>="]
    assert verdicts["non_negative(id)"]


def test_approx_mode_runs(base):
    """exact=False swaps HLL sketches in (no Expand); rule set remains
    sane on this tiny fixture where HLL is exact-ish."""
    got = _by_rule(suggest_rules(base, max_categories=3, exact=False))
    assert ("id", "is_unique") in got
    assert ("lang", "is_contained_in") in got


def test_empty_and_all_null_columns(spark):
    empty = spark.createDataFrame([], SCHEMA)
    assert suggest_rules(empty).count() == 0
    allnull = spark.createDataFrame(
        [(None, None)], "a bigint, b string"
    )
    got = _by_rule(suggest_rules(allnull))
    # nothing sane to suggest from a column with no observed values
    assert got == {}
