#!/usr/bin/env python
"""Capture .explain('formatted') for the round-6-touched bench queries.

Usage: python scripts/capture_r06_plans.py <outdir> <suffix>
Run from the repo whose plans you want (round-start worktree for
'before', the working tree for 'after'). Writes
<outdir>/<query>_<suffix>.txt. Uses sf0.1 + the 2M-row bench table
(already materialized under /tmp/rcf_bench) on local[8] — plan SHAPE
does not depend on the core count.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from bench import _ensure_bench_table
    from random_cut_forest_by_aws_spark import get_spark
    from random_cut_forest_by_aws_spark.functions import token_features
    from random_cut_forest_by_aws_spark.operators import (
        token_equality_violations,
        uniqueness_violations,
    )
    from random_cut_forest_by_aws_spark.operators.contamination import (
        ngram_contamination,
    )
    from random_cut_forest_by_aws_spark.operators.dedup import minhash_candidates
    from random_cut_forest_by_aws_spark.operators.drift import (
        DriftConfig,
        drift_scores,
    )
    from random_cut_forest_by_aws_spark.operators.packing import pack_sequences
    from random_cut_forest_by_aws_spark.operators.scrub import pii_profile
    from random_cut_forest_by_aws_spark.operators.textqc import BPE_ISH_PATTERN

    spark = get_spark(app_name="r06-plans", master="local[8]",
                      shuffle_partitions=8)
    seqs = spark.read.parquet(_ensure_bench_table(spark, 2_000_000))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    feat = seqs.withColumn("features", token_features()).select(
        "source", "seq", "features"
    )
    drift_cfg = DriftConfig(num_trees=30, sample_size=256,
                            rows_per_bucket=12_500)
    evals = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    toks = docs.select(
        "source", "doc_id",
        F.regexp_count(F.col("text"), F.lit(BPE_ISH_PATTERN))
        .cast("bigint").alias("n_tok"),
    )

    targets = {
        "drift_scores": lambda: drift_scores(feat, cfg=drift_cfg),
        "token_invariants": lambda: token_equality_violations(seqs),
        "minhash_dedup": lambda: minhash_candidates(docs),
        "contamination": lambda: ngram_contamination(corpus, evals, n=3),
        "pii_profile": lambda: pii_profile(docs),
        "pack_sequences": lambda: pack_sequences(toks, 2048, "n_tok"),
        "uniqueness_lineitem": lambda: uniqueness_violations(
            li, ["l_orderkey"]
        ),
    }
    for name, build in targets.items():
        try:
            df = build()
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(outdir, f"{name}_{suffix}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
            print("wrote", path, file=sys.stderr)
        except Exception as e:  # keep capturing the rest
            print("FAILED", name, e, file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
