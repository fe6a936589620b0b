"""Mergeable metric states — incremental validation without rescans.

deequ's algebraic-states idea (StateProvider / `Analyzer.computeStateFrom`
+ `merge`): every column statistic the suite verdicts on decomposes into
a small ALGEBRAIC STATE (counts, sums, sums of squares, min/max, HLL
registers) that merges associatively. Store the state per ingested
partition/crawl; when new data lands, compute the state of the NEW rows
only and fold it into the stored state — full-corpus statistics at
10^12 rows without ever rescanning yesterday's data. This is the
row-stats complement of the suite's stored histogram profile
(`--baseline-profile`, distribution drift) and metrics history
(anomaly checks).

State row per group: ``n_rows`` plus per numeric column
``{col}_cnt / _sum / _sumsq / _min / _max / _nulls`` and per key column
``{col}_hll`` (Spark's Apache DataSketches HLL binary via
``hll_sketch_agg``, merged with ``hll_union_agg``). The algebraic
fields merge EXACTLY; the HLL union is estimate-stable but not
bit-identical to a single-pass sketch (DataSketches' union path keeps
its own internal mode), so both estimates carry the same ~1.6%/√(2^lg_k)
error bound vs the exact cardinality — pinned in tests.

Scale shape: ``stats_state`` is one map-side-combined aggregate over one
scan of the new slice (column-pruned to the profiled columns);
``merge_stats_states`` aggregates state ROWS (|groups| × |slices| of
them — never row-scale); ``stats_from_state`` is pure projection
arithmetic. Every derived statistic except the HLL estimate is exact
closed-form over the sums, so the driver gate replays the whole
state→merge→derive chain in DuckDB against direct full-table statistics.

Reference analogue: the reference maintains its running statistics as
mergeable Deviation sketches (`Java/core/.../statistics/Deviation.java`);
here the same accumulate-then-merge discipline is expressed as
DataFrame aggregates (no reference counterpart for the HLL part —
north-star "metrics to an Iceberg metrics table" surface, cf. deequ's
InMemoryStateProvider/HdfsStateProvider).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stats_state(
    df: DataFrame,
    numeric_cols: Sequence[str],
    key_cols: Sequence[str] = (),
    group_by: Sequence[str] = (),
    hll_lg_k: int = 12,
) -> DataFrame:
    """Algebraic stats state of ``df`` (one scan, one aggregate):
    the mergeable representation of every statistic ``stats_from_state``
    derives. Compute it per ingested slice and persist it next to the
    data; never recompute over old slices."""
    aggs: list = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    for col in numeric_cols:
        c = F.col(col).cast("double")
        aggs += [
            F.count(c).cast("bigint").alias(f"{col}_cnt"),
            F.sum(c).alias(f"{col}_sum"),
            F.sum(c * c).alias(f"{col}_sumsq"),
            F.min(c).alias(f"{col}_min"),
            F.max(c).alias(f"{col}_max"),
            (F.count(F.lit(1)) - F.count(c)).cast("bigint")
            .alias(f"{col}_nulls"),
        ]
    for col in key_cols:
        aggs.append(F.hll_sketch_agg(F.col(col), F.lit(hll_lg_k))
                    .alias(f"{col}_hll"))
    g = df.groupBy(*group_by) if group_by else df.groupBy()
    return g.agg(*aggs)


def merge_stats_states(
    states: DataFrame,
    numeric_cols: Sequence[str],
    key_cols: Sequence[str] = (),
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Fold any number of state rows (e.g. yesterday's stored state
    unioned with today's new-slice state) into one state per group.
    Associative and commutative: sums add, min/max fold, HLL sketches
    union — the merged algebraic fields equal the state computed over
    the concatenated data exactly; the merged HLL estimate stays within
    the sketch's error bound of it (pinned in tests)."""
    aggs: list = [F.sum("n_rows").cast("bigint").alias("n_rows")]
    for col in numeric_cols:
        aggs += [
            F.sum(f"{col}_cnt").cast("bigint").alias(f"{col}_cnt"),
            F.sum(f"{col}_sum").alias(f"{col}_sum"),
            F.sum(f"{col}_sumsq").alias(f"{col}_sumsq"),
            F.min(f"{col}_min").alias(f"{col}_min"),
            F.max(f"{col}_max").alias(f"{col}_max"),
            F.sum(f"{col}_nulls").cast("bigint").alias(f"{col}_nulls"),
        ]
    for col in key_cols:
        aggs.append(F.hll_union_agg(F.col(f"{col}_hll"))
                    .alias(f"{col}_hll"))
    g = states.groupBy(*group_by) if group_by else states.groupBy()
    return g.agg(*aggs)


def stats_from_state(
    state: DataFrame,
    numeric_cols: Sequence[str],
    key_cols: Sequence[str] = (),
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Derive the verdict-facing statistics from a state — pure
    projection arithmetic over the (tiny) state rows: per numeric
    column count/nulls/null_rate/sum/min/max/mean/stddev_pop, per key
    column the HLL cardinality estimate. Everything except the HLL
    estimate is exact closed-form (mean = sum/cnt, stddev_pop =
    sqrt(max(sumsq/cnt − mean², 0)))."""
    cols: list = [*[F.col(g) for g in group_by], F.col("n_rows")]
    for col in numeric_cols:
        cnt = F.col(f"{col}_cnt")
        s, ss = F.col(f"{col}_sum"), F.col(f"{col}_sumsq")
        mean = F.when(cnt > 0, s / cnt.cast("double"))
        cols += [
            cnt.alias(f"{col}_cnt"),
            F.col(f"{col}_nulls").alias(f"{col}_nulls"),
            (F.col(f"{col}_nulls").cast("double")
             / F.col("n_rows").cast("double")).alias(f"{col}_null_rate"),
            s.alias(f"{col}_sum"),
            F.col(f"{col}_min").alias(f"{col}_min"),
            F.col(f"{col}_max").alias(f"{col}_max"),
            mean.alias(f"{col}_mean"),
            F.when(cnt > 0, F.sqrt(F.greatest(
                ss / cnt.cast("double")
                - (s / cnt.cast("double")) * (s / cnt.cast("double")),
                F.lit(0.0)))).alias(f"{col}_stddev_pop"),
        ]
    for col in key_cols:
        cols.append(F.hll_sketch_estimate(F.col(f"{col}_hll"))
                    .cast("bigint").alias(f"{col}_cardinality"))
    return state.select(*cols)
