"""Distributed as-of join (point-in-time alignment).

A training-data pipeline constantly needs "attach the most recent state
as of this row's timestamp" (features-as-of-event, price-as-of-trade,
config-as-of-run). Spark has no native as-of join; the naive
`t_right <= t_left` range join explodes quadratically per key. This
implements the scale-safe union trick:

    tag left rows (marker=1) and right rows (marker=0), union on a
    common (key, ts) spine, then one window per key ordered by
    (ts, marker) carrying `last(value, ignorenulls=True)` forward —
    every left row picks up the latest right row with ts_right <= ts_left
    (inclusive on equality because marker orders right rows first).

Physical shape: one hash exchange of |L| + |R| rows on the join key and
one per-key sort (Spark's window spills; no per-key materialization), no
row blow-up, no driver involvement — survives 100 TB on the left side as
long as single keys fit a sort spill, the same bound as any windowed
computation. Equivalent semantics to DuckDB's `ASOF LEFT JOIN`
(`>=` match) and pandas `merge_asof(direction="backward",
allow_exact_matches=True)`, both used as oracles in tests/gate.

Right-side contract: at most one row per (key, ts) — pre-aggregate
duplicates upstream, otherwise which duplicate wins is tie-undefined in
every engine's as-of semantics.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_MARK = "__asof_marker"
_RTS = "__asof_right_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_left: str,
    key_right: str,
    ts_left: str,
    ts_right: str,
    value_cols: Sequence[str],
    tolerance: str | None = None,
) -> DataFrame:
    """Backward (most-recent-at-or-before) as-of join.

    Returns ``left`` with ``value_cols`` from the matching right row
    appended (null when no right row at or before the left timestamp —
    or none within ``tolerance``, an INTERVAL string like '30 days').
    """
    left_cols = left.columns
    l_tagged = left.select(
        F.col(key_left).alias("__asof_key"),
        F.col(ts_left).cast("timestamp").alias("__asof_ts"),
        F.lit(1).alias(_MARK),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in value_cols],
        F.lit(None).cast("timestamp").alias(_RTS),
    )
    # SQL equality semantics: a right row with a null key or null timestamp
    # can never match (null = x is not true). Spark's window would instead
    # group null keys together and fill them — drop those rows up front.
    # Left rows with null key/ts stay, and get null value columns: their
    # partition contains no right rows (or, for null ts, nulls sort first so
    # the frame holds no right rows either).
    right_matchable = right.where(
        F.col(key_right).isNotNull() & F.col(ts_right).isNotNull()
    )
    r_tagged = right_matchable.select(
        F.col(key_right).alias("__asof_key"),
        F.col(ts_right).cast("timestamp").alias("__asof_ts"),
        F.lit(0).alias(_MARK),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[F.col(c) for c in value_cols],
        F.col(ts_right).cast("timestamp").alias(_RTS),
    )
    w = (
        Window.partitionBy("__asof_key")
        .orderBy("__asof_ts", _MARK)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = r_tagged.unionByName(l_tagged).select(
        *[F.col(c) for c in left_cols],
        F.col(_MARK).alias(_MARK),
        F.last(_RTS, ignorenulls=True).over(w).alias(_RTS),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
    )
    out = filled.where(F.col(_MARK) == 1).drop(_MARK)
    if tolerance is not None:
        in_tol = F.col(_RTS) >= F.col(ts_left).cast("timestamp") - F.expr(
            f"INTERVAL {tolerance}"
        )
        out = out.select(
            *[F.col(c) for c in left_cols],
            *[F.when(in_tol, F.col(c)).alias(c) for c in value_cols],
        )
    else:
        out = out.drop(_RTS)
    return out
