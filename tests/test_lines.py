"""Line-level boilerplate dedup (operators/lines.py)."""

from __future__ import annotations

import pytest

from random_cut_forest_by_aws_spark.operators.lines import (
    dedup_lines,
    line_frequencies,
)

SCHEMA = "doc_id bigint, text string"


@pytest.fixture(scope="module")
def corpus(spark):
    # "FOOTER" repeats in 3 of 4 docs (case/whitespace-varied — the
    # normalizer must unify them); "unique ..." lines are per-doc prose;
    # blank lines are structure that must survive.
    rows = [
        (1, "unique alpha\nFOOTER line\n\nunique beta"),
        (2, "footer line \nunique gamma"),
        (3, "unique delta\n FOOTER LINE"),
        (4, "unique epsilon\nunique zeta"),
        (5, None),
        (6, ""),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_line_frequencies(corpus):
    freq = {
        r["line"]: r["n_docs"]
        for r in line_frequencies(corpus, sep="\n").collect()
    }
    assert freq["footer line"] == 3
    assert freq["unique alpha"] == 1
    # blank line (doc 1) and empty doc 6 excluded by min_chars=1
    assert "" not in freq


def test_dedup_lines_removes_boilerplate_preserves_order(corpus):
    out = {
        r["doc_id"]: r
        for r in dedup_lines(corpus, max_doc_freq=3, sep="\n").collect()
    }
    # ORIGINAL text survives for kept lines; blank line kept in place
    assert out[1]["text_clean"] == "unique alpha\n\nunique beta"
    assert (out[1]["n_lines"], out[1]["n_removed"]) == (4, 1)
    assert out[2]["text_clean"] == "unique gamma"
    assert out[3]["text_clean"] == "unique delta"
    assert out[4]["text_clean"] == "unique epsilon\nunique zeta"
    assert out[4]["n_removed"] == 0
    # NULL text → no row; empty text → one empty line, kept (min_chars)
    assert 5 not in out
    assert out[6]["text_clean"] == ""
    assert (out[6]["n_lines"], out[6]["n_removed"]) == (1, 0)


def test_dedup_lines_threshold_and_normalize_off(corpus):
    # threshold above the max frequency removes nothing
    out = dedup_lines(corpus, max_doc_freq=4, sep="\n").collect()
    assert all(r["n_removed"] == 0 for r in out)
    # normalize=False: the three footer variants no longer unify
    out = {
        r["doc_id"]: r
        for r in dedup_lines(
            corpus, max_doc_freq=2, sep="\n", normalize=False
        ).collect()
    }
    assert all(r["n_removed"] == 0 for r in out.values())


def test_dedup_lines_emptied_doc_and_min_chars(spark):
    df = spark.createDataFrame(
        [(1, "same\nsame"), (2, "same"), (3, "same\nx")], SCHEMA
    )
    out = {
        r["doc_id"]: r
        for r in dedup_lines(df, max_doc_freq=3, sep="\n").collect()
    }
    assert out[1]["text_clean"] == ""  # fully boilerplate, row kept
    assert out[1]["n_removed"] == 2  # every occurrence goes, not one
    assert out[3]["text_clean"] == "x"
    # min_chars=2 protects 1-char lines from counting AND removal
    df2 = spark.createDataFrame([(1, "x\nab"), (2, "x\nab"), (3, "x")], SCHEMA)
    out2 = {
        r["doc_id"]: r["text_clean"]
        for r in dedup_lines(df2, max_doc_freq=2, sep="\n", min_chars=2).collect()
    }
    assert out2 == {1: "x", 2: "x", 3: "x"}


def test_dedup_lines_literal_separator_not_regex(spark):
    # '.' must split literally, not as regex-any
    df = spark.createDataFrame([(1, "ab.cd"), (2, "ab.ef")], SCHEMA)
    out = {
        r["doc_id"]: r["text_clean"]
        for r in dedup_lines(df, max_doc_freq=2, sep=".").collect()
    }
    assert out == {1: "cd", 2: "ef"}


def test_dedup_lines_single_corpus_scan_per_pass(corpus):
    """Plan shape: exactly 2 scans of the corpus (frequency pass +
    rewrite pass), boilerplate side broadcast — no row-scale shuffle
    join on line keys."""
    plan = dedup_lines(corpus, max_doc_freq=3)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") <= 2
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
