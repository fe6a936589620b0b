#!/usr/bin/env python
"""Split the suite wall into phases vs tail (verdict/violation/metrics
consumption) — the 'suite-other' residual in the bench artifacts.

Mimics bench.py's timed region exactly (ValidationSuite.run + verdicts
.collect + violations.count) but times each tail action separately, and
times the phase-rows collect that bench does AFTER the window.
"""

from __future__ import annotations

import json
import os
import sys
import time

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    rows = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "2000000"))

    from pyspark.sql import functions as F

    from bench import _ensure_bench_table
    from random_cut_forest_by_aws_spark import get_spark
    from random_cut_forest_by_aws_spark.operators.drift import DriftConfig
    from random_cut_forest_by_aws_spark.plans import SuiteConfig, ValidationSuite
    from random_cut_forest_by_aws_spark.sources import sources_dim

    spark = get_spark(app_name="suite-tail-profile", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    seqs = spark.read.parquet(_ensure_bench_table(spark, rows))
    dim = sources_dim(spark)
    spark.range(100_000).repartition(cpus).groupBy(
        (F.col("id") % cpus).alias("g")
    ).applyInPandas(lambda k, p: p[["id"]].head(1), "id long").count()
    seqs.select(F.sum(F.size("tokens"))).collect()

    cfg = SuiteConfig(drift=DriftConfig(num_trees=30, sample_size=256,
                                        rows_per_bucket=12_500))
    out = []
    for run in range(int(os.environ.get("SPARK_GRAFT_SUITE_RUNS", "2"))):
        t0 = time.time()
        res = ValidationSuite(spark, cfg).run(seqs, ref_dim=dim)
        t_run = time.time()
        res.verdicts.collect()
        t_verd = time.time()
        res.violations.count()
        t_viol = time.time()
        phases = {
            r["check"]: round(float(r["duration_sec"]), 3)
            for r in res.metrics.select("check", "duration_sec").collect()
        }
        t_metrics = time.time()
        spark.catalog.clearCache()
        out.append({
            "run": run + 1,
            "wall_timed": round(t_viol - t0, 3),
            "run_build_sec": round(t_run - t0, 3),
            "phases_sum": round(sum(phases.values()), 3),
            "run_nonphase_sec": round(t_run - t0 - sum(phases.values()), 3),
            "verdicts_collect_sec": round(t_verd - t_run, 3),
            "violations_count_sec": round(t_viol - t_verd, 3),
            "metrics_collect_sec": round(t_metrics - t_viol, 3),
            "phases": phases,
        })
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
