"""Uniqueness constraint via two-phase salted hash-aggregate (north_rule b).

Phase 1 groups by ``(key, salt)`` where salt = task partition id mod S —
this bounds the size of any single reducer group even when one key value
dominates (e.g. a null-ish sentinel doc_id repeated 10^9 times at
10^12-row scale). Phase 2 re-aggregates the per-salt partial counts by
key. For well-distributed keys Catalyst's map-side partial aggregation
already gives the same effect; the explicit salt is the insurance policy
for adversarial skew, at the cost of a second (tiny) shuffle over
partially-aggregated rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def uniqueness_violations(
    df: DataFrame,
    key_cols: Sequence[str],
    salt_buckets: int = 64,
    count_nulls: bool = False,
) -> DataFrame:
    """Rows ``(key..., dup_count)`` for every key appearing more than once.

    Null keys are a separate constraint (null-rate in stats); by default
    they are excluded here, matching SQL UNIQUE semantics.
    """
    # NOT spread via ensure_compute_parallelism (round-6 A/B): the
    # phase-1 aggregate is a cheap key-only hash map — on a single-file
    # input the round-robin exchange costs more than the parallelism
    # buys (0.51 s vs 1.12 s at 600k rows). The spread guard is
    # reserved for operators with heavy per-row compute.
    keys = [F.col(k) for k in key_cols]
    scoped = df
    if not count_nulls:
        cond = None
        for k in key_cols:
            c = F.col(k).isNotNull()
            cond = c if cond is None else (cond & c)
        scoped = df.filter(cond)
    salted = (
        scoped.withColumn("_salt", F.pmod(F.spark_partition_id(), F.lit(salt_buckets)))
        .groupBy(*keys, F.col("_salt"))
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return (
        salted.groupBy(*[F.col(k) for k in key_cols])
        .agg(F.sum("_partial").alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


def uniqueness_verdict(
    df: DataFrame, key_cols: Sequence[str], salt_buckets: int = 64
) -> DataFrame:
    """One-row summary: number of violating keys and excess rows."""
    v = uniqueness_violations(df, key_cols, salt_buckets)
    return v.agg(
        F.count(F.lit(1)).alias("violating_keys"),
        F.coalesce(F.sum(F.col("dup_count") - 1), F.lit(0)).alias("excess_rows"),
    ).withColumn("passed", F.col("violating_keys") == 0)
