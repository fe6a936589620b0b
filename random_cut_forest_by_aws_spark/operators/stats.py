"""Per-column statistics operator (north_rule item a).

Pure DataFrame aggregations — one shuffle on the grouping key, map-side
partial aggregation (Catalyst HashAggregate partial → final), whole-stage
codegen, column pruning down to exactly the profiled columns. Quantiles
use ``percentile_approx`` (a GK/KLL-style mergeable sketch — see
PAPERS.md) and cardinality ``approx_count_distinct`` (HyperLogLog++), both
of which merge associatively so the plan scales to 10^12 rows without a
driver bottleneck.

The reference's analogue of these running statistics is the discounted
``Deviation`` sketch (``Java/core/.../statistics/Deviation.java:24-76``);
here plain distributed aggregation replaces single-stream discounting.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def numeric_profile(
    df: DataFrame,
    col: str,
    group_by: Sequence[str] | None = None,
    quantiles: Sequence[float] = (0.25, 0.5, 0.75, 0.95, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """min/max/null-rate/mean/stddev + quantile sketch for one numeric column."""
    c = F.col(col)
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.count(c).alias("n_present"),
        (F.count(F.lit(1)) - F.count(c)).alias("n_null"),
        F.min(c).alias("min"),
        F.max(c).alias("max"),
        F.avg(c).alias("mean"),
        F.stddev_samp(c).alias("stddev"),
        F.percentile_approx(c, list(quantiles), accuracy).alias("quantiles"),
    ]
    g = df.groupBy(*group_by) if group_by else df.groupBy()
    out = g.agg(*aggs)
    return out.withColumn(
        "null_rate", F.col("n_null").cast("double") / F.col("n_rows").cast("double")
    )


def column_stats(
    df: DataFrame,
    numeric_cols: Sequence[str],
    key_cols: Sequence[str] = (),
    group_by: Sequence[str] | None = None,
    exact_distinct: bool = False,
    quantiles: Sequence[float] = (),
    quantile_accuracy: int = 10_000,
) -> DataFrame:
    """Wide stats row per group: per-numeric-column min/max/null-count
    (plus optional mergeable quantile sketches — ``percentile_approx``,
    the 10^12-row scale path; the driver gate keeps exact percentiles for
    oracle matching) and per-key-column cardinality (HLL sketch; exact
    opt-in for test scale)."""
    aggs: list = [F.count(F.lit(1)).alias("n_rows")]
    for col in numeric_cols:
        c = F.col(col)
        aggs += [
            F.min(c).alias(f"{col}_min"),
            F.max(c).alias(f"{col}_max"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{col}_nulls"),
            F.sum(c).alias(f"{col}_sum"),
        ]
        if quantiles:
            aggs.append(
                F.percentile_approx(c, list(quantiles), quantile_accuracy).alias(
                    f"{col}_quantiles"
                )
            )
    for col in key_cols:
        # key-col null count: countDistinct ignores nulls, so a not-null
        # verdict must come from its own aggregate (skip when the numeric
        # loop above already emitted the same alias)
        if col not in numeric_cols:
            aggs.append(
                (F.count(F.lit(1)) - F.count(F.col(col))).alias(f"{col}_nulls")
            )
        if exact_distinct:
            aggs.append(F.countDistinct(F.col(col)).alias(f"{col}_cardinality"))
        else:
            aggs.append(F.approx_count_distinct(F.col(col)).alias(f"{col}_cardinality"))
    g = df.groupBy(*group_by) if group_by else df.groupBy()
    return g.agg(*aggs)


def rollup_stats(
    df: DataFrame,
    dims: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Multi-dimensional dataset reporting: count / sum / min / max of
    ``value_col`` at EVERY prefix level of ``dims`` plus the grand
    total, via native ``ROLLUP`` grouping sets — the "corpus report"
    a curation run publishes (rows per source, tokens per (source,
    length-band), grand totals) in ONE aggregation.

    Plan shape: Spark expands rollup grouping sets inside a single
    Expand + HashAggregate pair — one scan, map-side partials, one
    exchange on the grouping-set key; len(dims)+1 result granularities
    for the price of one aggregate instead of len(dims)+1 separate
    jobs. Subtotal rows carry NULL in the rolled-up dimension and
    ``grouping_id`` disambiguates a real NULL dimension value from a
    rollup subtotal (the standard SQL convention, replayed exactly by
    any engine's ROLLUP). ``val_sum/val_min/val_max`` keep
    ``value_col``'s own numeric type — no silent integer truncation of
    double metrics."""
    gid = F.grouping_id(*[F.col(d) for d in dims]).cast("bigint")
    return (
        df.rollup(*dims)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(value_col).alias("val_sum"),
            F.min(value_col).alias("val_min"),
            F.max(value_col).alias("val_max"),
            gid.alias("grouping_lvl"),
        )
    )
