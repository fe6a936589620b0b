#!/usr/bin/env python
"""Round-6 isolation benchmarks (guide §1.4): time individual pieces of
the bench surface with the noop sink so the computation is measured, not
the collect/sink. Does NOT replace bench.py (frozen); cite these numbers
in OPTIMIZATION_r06.md only.

Usage: python bench_extra.py [piece ...]
Pieces: features, invariants, drift, drift_scan, suite_consume,
        reconcile, stats, uniqueness. Default: all.
Env: SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_ROWS as bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    pieces = sys.argv[1:] or [
        "features", "invariants", "drift", "reconcile", "stats", "uniqueness",
    ]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    rows = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "2000000"))

    from pyspark.sql import functions as F

    from bench import _ensure_bench_table
    from random_cut_forest_by_aws_spark import get_spark
    from random_cut_forest_by_aws_spark.functions import token_features
    from random_cut_forest_by_aws_spark.operators import (
        column_stats,
        token_equality_violations,
        uniqueness_violations,
    )
    from random_cut_forest_by_aws_spark.operators.drift import (
        DriftConfig,
        drift_scores,
        drift_verdicts,
    )

    spark = get_spark(app_name="rcf-bench-extra", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    seqs = spark.read.parquet(_ensure_bench_table(spark, rows))
    drift_cfg = DriftConfig(num_trees=30, sample_size=256, rows_per_bucket=12_500)

    # warm exactly like bench.py
    spark.range(100_000).repartition(cpus).groupBy(
        (F.col("id") % cpus).alias("g")
    ).applyInPandas(lambda k, p: p[["id"]].head(1), "id long").count()
    seqs.select(F.sum(F.size("tokens"))).collect()

    timings = {}

    def timed(name, fn, repeats=2):
        best = None
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(f"extra:{name}")
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        print(f"[extra] {name}: {timings[name]}s", file=sys.stderr, flush=True)

    feat = seqs.withColumn("features", token_features()).select(
        "source", "seq", "features"
    )

    if "features" in pieces:
        timed("token_features_noop", lambda: noop(feat))
        timed("scan_only_noop", lambda: noop(seqs.select("source", "seq", "n_tok")))
        timed("scan_tokens_noop", lambda: noop(seqs.select("tokens")))
    if "invariants" in pieces:
        timed("token_invariants_count",
              lambda: token_equality_violations(seqs).count())
    if "drift" in pieces:
        def run_drift():
            raw = drift_scores(feat, cfg=drift_cfg)
            return drift_verdicts(raw, cfg=drift_cfg).collect()
        timed("drift_full", run_drift)
        timed("drift_scores_noop",
              lambda: noop(drift_scores(feat, cfg=drift_cfg)))
    if "reconcile" in pieces:
        from random_cut_forest_by_aws_spark.operators.diff import (
            snapshot_diff_summary,
        )

        def run_reconcile():
            base = seqs.filter(F.xxhash64("doc_id") % 10 != 0).withColumn(
                "n_tok",
                F.when(F.xxhash64("doc_id") % 7 == 0, F.col("n_tok") + 1)
                .otherwise(F.col("n_tok")),
            )
            return snapshot_diff_summary(base, seqs, "doc_id").collect()
        timed("reconcile", run_reconcile)
    if "stats" in pieces:
        timed("column_stats", lambda: column_stats(
            seqs, ["n_tok"], key_cols=["doc_id", "source"], group_by=["source"]
        ).collect())
    if "uniqueness" in pieces:
        timed("uniqueness", lambda: uniqueness_violations(seqs, ["doc_id"]).count())

    print(json.dumps({"cpus": cpus, "rows": rows, "timings": timings}))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
