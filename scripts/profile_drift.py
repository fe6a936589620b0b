#!/usr/bin/env python
"""Per-phase profile of the drift operator at bench scale.

Runs the bench drift query (same table/config as bench.py) with
SPARK_GRAFT_DRIFT_PROFILE set, aggregates every task's phase JSON, and
prints one JSON line:

  {"wall_sec": ..., "task_core_sec": ..., "phases": {"update": ...},
   "residual_sec": ...}

The phase seconds are SUMS over all tasks (core-seconds, not wall);
`wall_sec` is the driver-observed query wall. The gap between wall and
task_core_sec/cpus is the scan + exchange + Arrow + scheduling overhead
that lives outside the grouped-map fn.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROF_DIR = "/tmp/rcf_drift_profile"


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    rows = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "2000000"))
    shutil.rmtree(PROF_DIR, ignore_errors=True)
    os.environ["SPARK_GRAFT_DRIFT_PROFILE"] = PROF_DIR

    from pyspark.sql import functions as F

    from random_cut_forest_by_aws_spark import get_spark
    from random_cut_forest_by_aws_spark.functions import token_features
    from random_cut_forest_by_aws_spark.operators.drift import (
        DriftConfig,
        drift_scores,
        drift_verdicts,
    )

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _ensure_bench_table

    spark = get_spark(app_name="drift-profile", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    seqs = spark.read.parquet(_ensure_bench_table(spark, rows))
    # warm workers + page cache exactly like bench.py
    spark.range(100_000).repartition(cpus).groupBy(
        (F.col("id") % cpus).alias("g")
    ).applyInPandas(lambda k, p: p[["id"]].head(1), "id long").count()
    seqs.select(F.sum(F.size("tokens"))).collect()

    cfg = DriftConfig(num_trees=30, sample_size=256, rows_per_bucket=12_500)
    feat = seqs.withColumn("features", token_features()).select(
        "source", "seq", "features"
    )
    t0 = time.time()
    drift_verdicts(drift_scores(feat, cfg=cfg), cfg=cfg).collect()
    wall = time.time() - t0

    phases: dict[str, float] = {}
    task_total = 0.0
    n_tasks = 0
    for f in glob.glob(os.path.join(PROF_DIR, "task-*.json")):
        d = json.load(open(f))
        n_tasks += 1
        task_total += d.pop("task_total", 0.0)
        d.pop("n_rows", None)
        for k, v in d.items():
            phases[k] = phases.get(k, 0.0) + v
    residual = task_total - sum(phases.values())
    out = {
        "wall_sec": round(wall, 2),
        "cpus": cpus,
        "bench_rows": rows,
        "n_tasks": n_tasks,
        "task_core_sec": round(task_total, 1),
        "task_core_sec_per_cpu": round(task_total / cpus, 2),
        "phases_core_sec": {k: round(v, 1) for k, v in sorted(phases.items())},
        "fn_residual_core_sec": round(residual, 1),
        "outside_fn_wall_sec": round(wall - task_total / cpus, 2),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
