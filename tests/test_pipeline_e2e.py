"""End-to-end corpus curation (plans/pipeline.py): the joint semantics
of funnel → keep-one dedup → decontamination → cluster-keyed splits →
mixture → packing → sharded sink on a planted fixture."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from random_cut_forest_by_aws_spark.plans import CurationConfig, curate_corpus

BASE = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu xi omicron pi rho sigma tau upsilon"
)


def _fixture(spark):
    rows = []
    # 40 distinct healthy docs across two sources
    for i in range(40):
        words = [f"w{i}_{j}" for j in range(20)]
        rows.append((i, " ".join(words), "web" if i % 2 else "books", 120))
    # a near-dup group: 100/101/102 share almost all shingles
    rows.append((100, BASE, "web", 120))
    rows.append((101, BASE + " extra", "web", 126))
    rows.append((102, "prefix " + BASE, "books", 127))
    # a QC reject (too short)
    rows.append((200, "tiny doc", "web", 8))
    # an eval-contaminated doc (shares an 8-gram with the eval set)
    rows.append(
        (300, "unrelated start one two three four five six seven eight end", "web", 120)
    )
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars int"
    )


def _evals(spark):
    return spark.createDataFrame(
        [(9000, "one two three four five six seven eight")],
        "doc_id long, text string",
    )


CFG = CurationConfig(
    qc_stages=[("min_len", "n_chars >= 50")],
    jaccard_threshold=0.5,
    splits={"train": 0.5, "val": 0.25, "test": 0.25},
    pack_budget=64,
    packs_per_shard=2,
)


@pytest.fixture(scope="module")
def result(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("curated"))
    res = curate_corpus(_fixture(spark), CFG, eval_docs=_evals(spark), out_path=out)
    return res, out


def test_funnel_accounting(result):
    res, _ = result
    rep = res.funnel_report.collect()[0]
    assert rep["dropped"] == 1  # doc 200
    assert rep["remaining"] == 44  # 45 fixture rows - doc 200


def test_keep_one_dedup(result):
    res, _ = result
    docs = {r["doc_id"]: r for r in res.documents.collect()}
    # only the min-id member of the planted group survives keep-one
    assert 100 in docs and 101 not in docs and 102 not in docs
    assert docs[100]["cluster_id"] == 100
    # singletons are their own cluster
    assert docs[0]["cluster_id"] == 0


def test_decontamination(result):
    res, _ = result
    assert res.contaminated is not None
    bad = [r["doc_id"] for r in res.contaminated.collect()]
    assert bad == [300]
    assert res.documents.filter("doc_id = 300").count() == 0


def test_cluster_keyed_splits_and_mixture_free_train(result):
    res, _ = result
    docs = res.documents
    assert docs.filter(~F.col("split").isin("train", "val", "test")).count() == 0
    # every surviving doc has exactly one split; counts add up
    # 44 survivors - 2 non-canonical dup members - 1 contaminated
    assert docs.count() == 41
    # train rows carry n_tok = whitespace token count
    t = res.train.collect()
    assert all(r["n_tok"] == len(r["text"].split(" ")) for r in t)


def test_leakage_guard_against_uncanonical_members(spark):
    """The split is keyed on cluster_id: even if keep-one is SKIPPED
    (keep all members), every member of a dup group lands in the same
    split — no near-dup of a test doc can reach train."""
    from random_cut_forest_by_aws_spark.operators.splits import assign_splits

    docs = _fixture(spark).withColumn(
        "cluster_id",
        F.when(F.col("doc_id").isin(100, 101, 102), F.lit(100)).otherwise(
            F.col("doc_id")
        ),
    )
    out = assign_splits(
        docs, CFG.splits, group_col="cluster_id", seed=CFG.split_seed
    )
    grp = out.filter(F.col("doc_id").isin(100, 101, 102))
    assert grp.select("split").distinct().count() == 1


def test_packing_tiles_budget(result):
    res, _ = result
    packed = res.packed.collect()
    by_pack = {}
    for r in packed:
        by_pack.setdefault((r["source"], r["pack_id"]), []).append(r)
    for (src, pid), rows in by_pack.items():
        spans = sorted((r["tok_begin"], r["tok_end"]) for r in rows)
        assert spans[0][0] == 0
        for (a1, b1), (a2, b2) in zip(spans, spans[1:]):
            assert b1 == a2  # contiguous tiling
        last_pack = max(p for (s, p) in by_pack if s == src)
        if pid < last_pack:
            assert spans[-1][1] == CFG.pack_budget  # full packs


def test_shard_sink_manifest(result):
    res, out = result
    man = duckdb.sql(f"SELECT * FROM '{out}/manifest/*.parquet'").fetchdf()
    dat = duckdb.sql(
        f"SELECT source, shard, count(*) AS n, sum(tok_end - tok_begin) AS toks"
        f" FROM parquet_scan('{out}/data/*/*/*.parquet', hive_partitioning=1)"
        f" GROUP BY source, shard"
    ).fetchdf()
    assert len(man) == len(dat)
    m = {(r.source, r.shard): r for r in man.itertuples()}
    for r in dat.itertuples():
        assert m[(r.source, r.shard)].n_tokens == r.toks


def test_custom_id_col_reaches_the_sink(spark, tmp_path):
    """CurationConfig(id_col=...) must thread through to the shard sink
    (it hardcoded doc_id — review finding)."""
    from random_cut_forest_by_aws_spark.plans import CurationConfig, curate_corpus

    docs = _fixture(spark).withColumnRenamed("doc_id", "uid")
    cfg = CurationConfig(
        qc_stages=[("min_len", "n_chars >= 50")],
        splits={"train": 0.5, "val": 0.25, "test": 0.25},
        pack_budget=64, packs_per_shard=2, id_col="uid",
    )
    out = str(tmp_path / "curated_uid")
    res = curate_corpus(docs, cfg, out_path=out)
    man = duckdb.sql(f"SELECT sum(n_docs) AS d FROM '{out}/manifest/*.parquet'").fetchone()
    assert man[0] > 0
    assert "uid" in res.packed.columns
