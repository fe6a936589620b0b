#!/usr/bin/env python
"""Scale evidence for the corpus-shaping operators (PII scrub, sequence
packing, quota sampling, corpus-LM quality): deterministic synthetic
corpora at two sizes, per-operator wall times at both, and DuckDB
replays of the packing / quota outputs at the small size (exact
aggregate-signature compare — the same computations the gate certifies
at 500 docs, re-certified at 1M).

The corpus is generated entirely JVM-side (seeded xxhash64 expressions,
no Python per row): 60-200 words per doc from a 2000-word vocabulary,
one mega-source holding ~50% of all documents (deliberate key skew —
the exact shape that breaks whole-key window plans), and a PII tail
appended to every 89th document. Tables cache under /tmp/rcf_bench/.

Usage: python scripts/bench_pipeline_scale.py [--sizes 1000000,4000000]
Emits one JSON line; host calibrations bracket the timing window (this
box's capacity swings 2x between windows — compare sec x Mops, never
raw seconds; see CLAUDE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PII_TAIL = " contact user42@example.com or 555-123-4567 at https://ex.com/a from 10.0.0.1"


def _docs_path(n: int) -> str:
    return f"/tmp/rcf_bench/docs_n{n}_s42.parquet"


def _ensure_docs(spark, n: int) -> str:
    path = _docs_path(n)
    if os.path.exists(path):
        return path
    from pyspark.sql import functions as F

    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.pmod(F.xxhash64("id", F.lit(7)), 100) < 50, F.lit("src0"))
        .otherwise(
            F.concat(F.lit("src"), (F.pmod(F.xxhash64("id", F.lit(7)), 19) + 1))
        )
        .alias("source"),
        (60 + F.pmod(F.xxhash64("id", F.lit(1)), 141)).alias("n_words"),
    )
    words = F.transform(
        F.sequence(F.lit(1), F.col("n_words")),
        lambda i: F.concat(
            F.lit("w"), F.pmod(F.xxhash64(F.col("doc_id"), i), 2000)
        ),
    )
    docs = base.select(
        "doc_id",
        "source",
        F.concat(
            F.concat_ws(" ", words),
            F.when(F.pmod("doc_id", F.lit(89)) == 0, F.lit(PII_TAIL)).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )
    docs.repartition(32).write.mode("overwrite").parquet(path)
    return path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1000000,4000000")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    from pyspark.sql import functions as F

    from bench import _calibrate_host
    from random_cut_forest_by_aws_spark import get_spark
    from random_cut_forest_by_aws_spark.operators.dedup import (
        minhash_candidates_incremental,
    )
    from random_cut_forest_by_aws_spark.operators.lm_quality import unigram_logprob
    from random_cut_forest_by_aws_spark.operators.packing import pack_sequences
    from random_cut_forest_by_aws_spark.operators.sampling import (
        quota_sample,
        token_budget_sample,
    )
    from random_cut_forest_by_aws_spark.operators.scrub import pii_profile
    from random_cut_forest_by_aws_spark.operators.textqc import BPE_ISH_PATTERN

    spark = get_spark(app_name="pipeline-scale", master=f"local[{args.cpus}]",
                      shuffle_partitions=max(args.cpus, 8))
    for n in sizes:  # generate at full parallelism before any timing
        _ensure_docs(spark, n)

    cal_pre = _calibrate_host()
    out: dict = {"metric": "pipeline_scale", "cpus": args.cpus, "sizes": {}}

    for n in sizes:
        docs = spark.read.parquet(_docs_path(n))
        docs.select(F.sum(F.length("text"))).collect()  # warm page cache
        timings: dict[str, float] = {}

        def timed(label: str, fn) -> None:
            t0 = time.time()
            fn()
            timings[label] = round(time.time() - t0, 3)

        timed("pii_profile", lambda: pii_profile(docs).agg(
            (F.sum("n_email") + F.sum("n_phone") + F.sum("n_ipv4")
             + F.sum("n_url") + F.sum("n_digit_run")
             + F.sum(F.length("redacted_text"))).alias("x")).collect())
        toks = docs.select(
            "source", "doc_id",
            F.regexp_count(F.col("text"), F.lit(BPE_ISH_PATTERN))
            .cast("bigint").alias("n_tok"))
        timed("pack_sequences", lambda: pack_sequences(toks, 2048, "n_tok")
              .agg(F.sum("tok_end").alias("x")).collect())
        timed("quota_sample", lambda: quota_sample(
            docs.select("source", "doc_id"), 1000).count())
        # token budgets that actually cut: src0 holds ~n/2 docs (~65M
        # tokens at 1M docs), the other 19 sources ~3.4M tokens each
        timed("token_budget", lambda: token_budget_sample(
            toks, {"src0": 5_000_000}, "n_tok", default_budget=1_000_000)
            .agg(F.sum("tokens_before").alias("a"),
                 F.count(F.lit(1)).alias("n")).collect())
        timed("incremental_minhash", lambda: minhash_candidates_incremental(
            docs.filter(F.pmod("doc_id", F.lit(2)) == 0),
            docs.filter(F.pmod("doc_id", F.lit(2)) == 1)).count())
        # substring-level dedup: winnowing at web-scale-ish window=16
        # (guarantee threshold 20 chars) — the k-gram hash + window-min
        # transforms are the dominant per-char cost; the bucket guard
        # bounds boilerplate fingerprints
        from random_cut_forest_by_aws_spark.operators.dedup import (
            winnow_candidates,
        )
        from random_cut_forest_by_aws_spark.operators.packing import (
            chunk_documents,
        )

        timed("winnow_candidates", lambda: winnow_candidates(
            docs, window=16).count())
        timed("chunk_documents", lambda: chunk_documents(
            docs, chunk_tokens=128, stride=64).agg(
            F.sum("n_tok").alias("x"), F.count(F.lit(1)).alias("n")).collect())
        timed("lm_quality", lambda: unigram_logprob(docs, min_count=5).agg(
            F.sum("n_oov").alias("a"), F.sum("logprob").alias("b")).collect())

        # row-level snapshot reconciliation: prior crawl = 90% of keys;
        # the exchange carries doc_id + per-column hashes only (the text
        # payload is hashed below the shuffle, never moved)
        from random_cut_forest_by_aws_spark.operators.diff import (
            snapshot_diff_summary,
        )

        timed("snapshot_diff", lambda: snapshot_diff_summary(
            docs.filter(F.pmod("doc_id", F.lit(10)) != 0), docs,
            "doc_id").collect())

        # the full curation chain (plans/pipeline.py): funnel → minhash/
        # Jaccard keep-one dedup → cluster-keyed splits → packing; timed
        # as ONE action over the packed train output (the end-to-end
        # critical path a dataset build runs)
        from random_cut_forest_by_aws_spark.plans import (
            CurationConfig, curate_corpus,
        )

        cur_cfg = CurationConfig(
            qc_stages=[("min_len", "length(text) >= 120")]
        )
        timed("curate_corpus", lambda: curate_corpus(docs, cur_cfg)
              .packed.agg(F.sum("tok_end").alias("x"),
                          F.count(F.lit(1)).alias("n")).collect())
        out["sizes"][str(n)] = {"timings_sec": timings,
                                "docs_per_sec": {
                                    k: round(n / v, 1)
                                    for k, v in timings.items()}}

    cal_post = _calibrate_host()
    out["host_cal_pre_mops"] = round(cal_pre, 1)
    out["host_cal_mops"] = round(cal_post, 1)

    # --- DuckDB replays at the smallest size (aggregate signatures) ----
    import duckdb

    n0 = sizes[0]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{_docs_path(n0)}/*.parquet'"
    )
    docs0 = spark.read.parquet(_docs_path(n0))
    toks0 = docs0.select(
        "source", "doc_id",
        F.regexp_count(F.col("text"), F.lit(BPE_ISH_PATTERN))
        .cast("bigint").alias("n_tok"))
    sig_cols = (
        F.count(F.lit(1)).alias("n"),
        F.sum("pack_id").alias("s_pack"),
        F.sum("tok_begin").alias("s_begin"),
        F.sum("tok_end").alias("s_end"),
        F.sum(F.col("doc_id") % 1_000_003).alias("s_doc"),
    )
    spark_pack = pack_sequences(toks0, 2048, "n_tok").agg(*sig_cols).collect()[0]
    duck_pack = con.execute("""
        WITH toks AS (
          SELECT source, doc_id,
                 CAST(len(regexp_extract_all(text,
                      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_tok
          FROM documents),
        cum AS (
          SELECT source, doc_id, n_tok,
                 CAST(COALESCE(SUM(n_tok) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS cum_before
          FROM toks WHERE n_tok > 0),
        packs AS (
          SELECT source, doc_id, n_tok, cum_before,
                 unnest(range(CAST(cum_before // 2048 AS BIGINT),
                              CAST((cum_before + n_tok - 1) // 2048 + 1
                                   AS BIGINT))) AS pack_id
          FROM cum)
        SELECT COUNT(*) AS n, SUM(pack_id) AS s_pack,
               SUM(GREATEST(0, cum_before - pack_id * 2048)) AS s_begin,
               SUM(LEAST(2048, cum_before + n_tok - pack_id * 2048)) AS s_end,
               SUM(doc_id % 1000003) AS s_doc
        FROM packs
    """).fetchone()
    pack_ok = tuple(spark_pack) == tuple(duck_pack)

    spark_q = quota_sample(docs0.select("source", "doc_id"), 1000).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("sample_rank").alias("s_rank"),
        F.sum(F.col("doc_id") % 1_000_003).alias("s_doc"),
    ).collect()[0]
    duck_q = con.execute("""
        WITH h AS (
          SELECT source, doc_id,
                 (((((doc_id % 2147483648) + 2147483648) % 2147483648)
                   * 2654435761 + 42) % 2147483648) AS qh
          FROM documents),
        r AS (
          SELECT source, doc_id,
                 ROW_NUMBER() OVER (PARTITION BY source
                                    ORDER BY qh, doc_id) AS sample_rank
          FROM h)
        SELECT COUNT(*) AS n, SUM(sample_rank) AS s_rank,
               SUM(doc_id % 1000003) AS s_doc
        FROM r WHERE sample_rank <= 1000
    """).fetchone()
    quota_ok = tuple(spark_q) == tuple(duck_q)

    spark_tb = token_budget_sample(
        toks0, {"src0": 5_000_000}, "n_tok", default_budget=1_000_000
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("tokens_before").alias("s_before"),
        F.sum("n_tok").alias("s_tok"),
        F.sum(F.col("doc_id") % 1_000_003).alias("s_doc"),
    ).collect()[0]
    duck_tb = con.execute("""
        WITH h AS (
          SELECT source, doc_id,
                 (((((doc_id % 2147483648) + 2147483648) % 2147483648)
                   * 2654435761 + 42) % 2147483648) AS qh,
                 CAST(len(regexp_extract_all(text,
                      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_tok
          FROM documents
          WHERE source IS NOT NULL AND doc_id IS NOT NULL),
        c AS (
          SELECT source, doc_id, n_tok,
                 CAST(COALESCE(SUM(n_tok) OVER (
                   PARTITION BY source ORDER BY qh, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS tokens_before
          FROM h)
        SELECT COUNT(*) AS n, SUM(tokens_before) AS s_before,
               SUM(n_tok) AS s_tok, SUM(doc_id % 1000003) AS s_doc
        FROM c WHERE tokens_before <
          (CASE WHEN source = 'src0' THEN 5000000 ELSE 1000000 END)
    """).fetchone()
    tb_ok = tuple(spark_tb) == tuple(duck_tb)

    out["verify_at_n"] = n0
    out["pack_signature_match"] = bool(pack_ok)
    out["quota_signature_match"] = bool(quota_ok)
    out["token_budget_signature_match"] = bool(tb_ok)
    if not (pack_ok and quota_ok and tb_ok):
        out["spark_pack"], out["duck_pack"] = list(spark_pack), list(duck_pack)
        out["spark_quota"], out["duck_quota"] = list(spark_q), list(duck_q)
        out["spark_tb"], out["duck_tb"] = list(spark_tb), list(duck_tb)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
