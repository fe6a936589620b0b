"""Mergeable metric states (operators/states.py): the merge of per-slice
states must equal the state computed over the concatenated data —
exactly for the algebraic fields, bit-identically for the HLL union."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from random_cut_forest_by_aws_spark.operators.states import (
    merge_stats_states,
    stats_from_state,
    stats_state,
)

NUM = ["n_chars"]
KEY = ["doc_id", "source"]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.01/documents.parquet")


def _derived(spark, df, group_by=()):
    st = stats_state(df, NUM, KEY, group_by)
    return stats_from_state(st, NUM, KEY, group_by)


def test_merge_of_slices_equals_direct(spark, docs):
    halves = [docs.filter(F.col("doc_id") % 2 == i) for i in (0, 1)]
    states = stats_state(halves[0], NUM, KEY).unionByName(
        stats_state(halves[1], NUM, KEY))
    merged = stats_from_state(
        merge_stats_states(states, NUM, KEY), NUM, KEY)
    direct = stats_from_state(stats_state(docs, NUM, KEY), NUM, KEY)
    m, d = merged.collect()[0].asDict(), direct.collect()[0].asDict()
    assert set(m) == set(d)
    for k in d:
        if k.endswith("_cardinality"):
            continue  # HLL handled below (estimate-stable, not exact)
        assert m[k] == pytest.approx(d[k], abs=1e-9), k
    # the algebraic fields merge exactly; the HLL union keeps its own
    # internal mode, so both estimates are bounded vs the EXACT count
    for col in ("doc_id", "source"):
        exact = docs.select(F.countDistinct(col)).collect()[0][0]
        for v in (m[f"{col}_cardinality"], d[f"{col}_cardinality"]):
            assert abs(v - exact) / exact < 0.05, (col, v, exact)


def test_incremental_fold_matches_growing_corpus(spark, docs):
    """The production loop: fold each new slice into the stored state,
    check the running statistics track the growing corpus exactly."""
    slices = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    stored = stats_state(slices[0], NUM, KEY)
    seen = slices[0]
    for s in slices[1:]:
        stored = merge_stats_states(
            stored.unionByName(stats_state(s, NUM, KEY)), NUM, KEY)
        seen = seen.unionByName(s)
        got = stats_from_state(stored, NUM, KEY).collect()[0].asDict()
        want = stats_from_state(
            stats_state(seen, NUM, KEY), NUM, KEY).collect()[0].asDict()
        for k in want:
            if k.endswith("_cardinality"):
                assert abs(got[k] - want[k]) <= max(2, 0.05 * want[k]), k
            else:
                assert got[k] == pytest.approx(want[k], abs=1e-9), k


def test_grouped_states(spark, docs):
    halves = [docs.filter(F.col("doc_id") % 2 == i) for i in (0, 1)]
    states = stats_state(halves[0], NUM, KEY, ["lang"]).unionByName(
        stats_state(halves[1], NUM, KEY, ["lang"]))
    merged = stats_from_state(
        merge_stats_states(states, NUM, KEY, ["lang"]), NUM, KEY, ["lang"])
    direct = stats_from_state(
        stats_state(docs, NUM, KEY, ["lang"]), NUM, KEY, ["lang"])
    m = {r["lang"]: r.asDict() for r in merged.collect()}
    d = {r["lang"]: r.asDict() for r in direct.collect()}
    assert set(m) == set(d)
    for lang, row in d.items():
        for k, v in row.items():
            if k == "lang":
                continue
            if k.endswith("_cardinality"):
                assert abs(m[lang][k] - v) <= max(2, 0.05 * v), (lang, k)
            else:
                assert m[lang][k] == pytest.approx(v, abs=1e-9), (lang, k)


def test_state_roundtrips_through_parquet(spark, docs, tmp_path):
    """States persist as plain parquet (the HLL column is binary) and
    merge after reload — the store-today-fold-tomorrow workflow."""
    p = str(tmp_path / "state")
    stats_state(docs.filter(F.col("doc_id") % 2 == 0), NUM, KEY) \
        .write.parquet(p)
    reloaded = spark.read.parquet(p)
    merged = merge_stats_states(
        reloaded.unionByName(
            stats_state(docs.filter(F.col("doc_id") % 2 == 1), NUM, KEY)),
        NUM, KEY)
    got = stats_from_state(merged, NUM, KEY).collect()[0]
    direct = stats_from_state(
        stats_state(docs, NUM, KEY), NUM, KEY).collect()[0]
    assert got["n_rows"] == direct["n_rows"]
    assert abs(got["doc_id_cardinality"]
               - direct["doc_id_cardinality"]) <= 0.05 * direct["doc_id_cardinality"]
    assert got["n_chars_mean"] == pytest.approx(direct["n_chars_mean"])


def test_suggest_from_state_matches_snapshot_suggestions(spark, docs):
    """Rules discovered from the merged state must equal the
    state-derivable subset of suggest_rules on the full data — the
    never-rescan loop: fold slice states, suggest from the store,
    enforce on the next crawl."""
    from random_cut_forest_by_aws_spark.operators.suggest import (
        check_from_suggestions,
        suggest_from_state,
        suggest_rules,
    )

    halves = [docs.filter(F.col("doc_id") % 2 == i) for i in (0, 1)]
    merged = merge_stats_states(
        stats_state(halves[0], NUM, KEY).unionByName(
            stats_state(halves[1], NUM, KEY)), NUM, KEY)
    from_state = suggest_from_state(merged, NUM, ["doc_id"])
    # exact snapshot run as the reference (approx_count_distinct's
    # rsd=0.05 HLL++ underestimates 500 as ~484 < the 0.98 keyness bar,
    # while the state's lg_k=12 DataSketches estimate nails it)
    snap = suggest_rules(docs, columns=NUM + ["doc_id"], exact=True)

    fs = {(r["column"], r["rule"]): r for r in from_state.collect()}
    sn = {(r["column"], r["rule"]): r for r in snap.collect()}
    # every state-derivable numeric rule matches the snapshot run
    for key in [("n_chars", "has_min"), ("n_chars", "has_max"),
                ("n_chars", "is_non_negative")]:
        assert key in fs and key in sn
        assert fs[key]["threshold"] == sn[key]["threshold"], key
    comp = [(c, r) for (c, r) in fs if r in ("is_complete",
                                             "has_completeness")]
    assert comp and all(k in sn for k in comp)
    # doc_id key-ness proposed from the HLL estimate on both paths
    assert ("doc_id", "is_unique") in fs
    assert ("doc_id", "is_unique") in sn
    # and the suggested check passes on the data that produced the state
    verdicts = check_from_suggestions(from_state).run(docs)
    assert all(r["passed"] for r in verdicts.collect())
