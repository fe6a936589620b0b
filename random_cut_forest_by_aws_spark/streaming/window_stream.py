"""Watermarked event-time window aggregation for streams (SURVEY §2.6).

The reference consumes time-ordered shingles and simply assumes ordered
delivery (``/root/reference/Java/parkservices/src/main/java/com/amazon/
randomcutforest/parkservices/ThresholdedRandomCutForest.java`` — ``process``
takes monotone timestamps); a distributed stream cannot. This module is
the Spark-native answer: event-time tumbling/hopping windows with a
watermark bounding how late a row may arrive and still be merged, built
entirely from Structured Streaming primitives so the state store, late-row
dropping, and window finalization are JVM-side and exactly-once under
checkpointing. No Python runs per row.

Scale shape: identical to the batch `window()` aggregate — partial hash
aggregate before the (window, keys) exchange, state store holds only open
windows (bounded by watermark horizon × key cardinality), append-mode
output emits each finalized window once.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_windowed_agg(
    stream: DataFrame,
    ts_col: str = "ts",
    keys: Sequence[str] = ("event_type",),
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "30 minutes",
    value_col: str | None = "value",
) -> DataFrame:
    """Windowed counts/sums over an event-time stream with late-data rules.

    Semantics (all enforced by Spark's state store, not re-implemented):
      * a row later than ``watermark`` behind the max event time seen so
        far is dropped;
      * a late row within the watermark merges into its still-open window;
      * a window finalizes (emits, in append mode) once the watermark
        passes its end.

    Returns an unresolved streaming DataFrame with columns
    ``ws`` (window-start epoch millis), ``*keys``, ``n_events``
    [, ``sum_value``] — start it with ``.writeStream`` in append mode.
    """
    w = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 2).alias("sum_value"))
    out_cols = ["n_events"] + (["sum_value"] if value_col is not None else [])
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(w.alias("w"), *keys)
        .agg(*aggs)
        .select(
            F.unix_millis(F.col("w.start").cast("timestamp")).alias("ws"),
            *keys,
            *out_cols,
        )
    )


def streaming_session_agg(
    stream: DataFrame,
    ts_col: str = "ts",
    keys: Sequence[str] = ("user_id",),
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
    value_col: str | None = "value",
) -> DataFrame:
    """Gap-based session windows over an event-time stream — the dynamic
    (data-defined) member of the window family, via Spark's native
    ``session_window`` state machinery:

      * events of one key whose silences never exceed ``gap`` coalesce
        into one session; a bridging row arriving in a LATER micro-batch
        merges two already-open sessions in the state store;
      * a session finalizes (append-mode emit, exactly once) when the
        watermark passes its end (last event + gap);
      * rows later than ``watermark`` are dropped by the state store.

    Returns ``ws``/``we`` (session start / end epoch millis), ``*keys``,
    ``n_events`` [, ``sum_value``]. Batch twin: the
    ``session_window_events`` gate query (oracle-checked vs DuckDB gap
    islands)."""
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 2).alias("sum_value"))
    out_cols = ["n_events"] + (["sum_value"] if value_col is not None else [])
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), *keys)
        .agg(*aggs)
        .select(
            F.unix_millis(F.col("w.start").cast("timestamp")).alias("ws"),
            F.unix_millis(F.col("w.end").cast("timestamp")).alias("we"),
            *keys,
            *out_cols,
        )
    )
