"""Constraint suggestion — profile a table once, propose a Check.

The missing half of the deequ loop: ``Check`` (operators/checks.py)
*enforces* declared rules; this module *discovers* them from a trusted
snapshot (deequ's ``ConstraintSuggestionRunner``). Suggest on
yesterday's known-good corpus, compile the suggestions into a ``Check``
with :func:`check_from_suggestions`, enforce on tomorrow's — the same
never-rescan-the-baseline workflow as ``snapshot_drift_vs_profile``.

Rules proposed (deequ's suggestion-rule analogues):

* completeness — ``is_complete`` when a column has zero NULLs, else
  ``has_completeness`` at the observed fraction floored to 4 dp (the
  floor absorbs same-distribution jitter in tomorrow's data);
* numeric range — ``has_min`` / ``has_max`` at the observed bounds,
  plus ``is_non_negative`` when the observed min is >= 0
  (NonNegativeNumbersRule);
* key-ness — ``is_unique`` when the column is fully distinct and
  complete (UniqueIfApproximatelyUniqueRule, exactified);
* categorical domain — ``is_contained_in`` over the observed value set
  when distinct count <= ``max_categories`` (CategoricalRangeRule).

Scale shape (10^12 rows): pass 1 is ONE conditional aggregate over ONE
scan (per-column non-null counts, min/max, distinct counts — exact
``count(distinct)`` plans an Expand whose row multiplication is the
price of exactness; ``exact=False`` swaps in ``approx_count_distinct``
HLL sketches, no Expand). Pass 2 runs only if some string column
qualified as categorical: ALL qualifying columns stack into (column,
value) entries inside ONE more scan (the ``snapshot_drift_multi``
pattern) and aggregate to <= cols x max_categories rows. The driver
ever sees one aggregate row plus that bounded value table — suggestions
are inherently driver-sized objects (a human reviews them), exactly as
in deequ.

Reference analogue: the reference validates fixed per-row invariants in
its harness (SURVEY §5); suggestion is the discovery counterpart the
north-star "constraint validation engine" implies, modeled on deequ's
public ConstraintSuggestion API.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: separator for the allowed-value list (ASCII unit separator: cannot
#: collide with real category text the way ',' would)
VALUE_SEP = "\x1f"

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)

_SCHEMA = T.StructType([
    T.StructField("column", T.StringType(), False),
    T.StructField("rule", T.StringType(), False),
    T.StructField("threshold", T.DoubleType(), True),
    T.StructField("allowed", T.StringType(), True),
    T.StructField("metric", T.DoubleType(), True),
    T.StructField("n_rows", T.LongType(), False),
])


def _floor4(x: float) -> float:
    """Observed fraction floored to 4 dp — double-exact in any engine
    (floor(x*1e4)/1e4 is the same IEEE op sequence everywhere)."""
    return math.floor(x * 10000.0) / 10000.0


def suggest_rules(
    df: DataFrame,
    columns: list[str] | None = None,
    max_categories: int = 32,
    exact: bool = True,
    unique_min_distinctness: float = 0.98,
) -> DataFrame:
    """Profile ``df`` and return one suggestion row per proposed rule:
    ``(column, rule, threshold, allowed, metric, n_rows)``.

    ``exact=True`` (default, and the oracle-replayable mode) uses exact
    ``count(distinct)``; ``exact=False`` uses HLL sketches — then
    ``is_unique`` is proposed when estimated distinctness >=
    ``unique_min_distinctness`` (HLL error means exact equality is the
    wrong test) and categorical qualification errs the same way.

    Deterministic: suggestions depend only on the data, and rows come
    out sorted by (column, rule).
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    if columns is None:
        columns = [
            f.name for f in df.schema.fields
            if isinstance(f.dataType, _NUMERIC + (T.StringType,))
        ]
    for c in columns:
        if c not in fields:
            raise ValueError(f"no such column: {c}")

    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for c in columns:
        aggs.append(F.count(F.col(c)).cast("bigint").alias(f"__nn_{c}"))
        if exact:
            aggs.append(F.countDistinct(F.col(c))
                        .cast("bigint").alias(f"__d_{c}"))
        else:
            aggs.append(F.approx_count_distinct(F.col(c))
                        .cast("bigint").alias(f"__d_{c}"))
        if isinstance(fields[c], _NUMERIC):
            aggs.append(F.min(F.col(c).cast("double")).alias(f"__min_{c}"))
            aggs.append(F.max(F.col(c).cast("double")).alias(f"__max_{c}"))
    prof = df.agg(*aggs).collect()[0].asDict()  # ONE aggregate row
    n = prof["__n"]

    # pass 2: observed value sets for ALL qualifying categorical string
    # columns in one stacked scan (bounded output: <= cols x max_categories)
    cat_cols = [
        c for c in columns
        if isinstance(fields[c], T.StringType)
        and 0 < prof[f"__d_{c}"] <= max_categories
        and not (exact and prof[f"__d_{c}"] == prof[f"__nn_{c}"] == n and n > 1)
    ]
    values: dict[str, list[str]] = {}
    if cat_cols:
        entries = [
            F.struct(F.lit(c).alias("column"),
                     F.col(c).cast("string").alias("value"))
            for c in cat_cols
        ]
        vt = (
            df.select(F.explode(F.array(*entries)).alias("e"))
            .filter(F.col("e.value").isNotNull())
            .select("e.column", "e.value")
            .groupBy("column")
            .agg(F.sort_array(F.collect_set("value")).alias("vals"))
            .collect()
        )
        values = {r["column"]: list(r["vals"]) for r in vt}

    rows: list[tuple] = []
    for c in columns:
        nn, d = prof[f"__nn_{c}"], prof[f"__d_{c}"]
        comp = (nn / n) if n > 0 else None
        if n > 0 and nn == n:
            rows.append((c, "is_complete", 1.0, None, comp, n))
        elif n > 0 and nn > 0:
            rows.append((c, "has_completeness", _floor4(comp), None, comp, n))
        if isinstance(fields[c], _NUMERIC) and nn > 0:
            lo, hi = prof[f"__min_{c}"], prof[f"__max_{c}"]
            rows.append((c, "has_min", lo, None, lo, n))
            rows.append((c, "has_max", hi, None, hi, n))
            if lo >= 0:
                rows.append((c, "is_non_negative", 1.0, None, lo, n))
        if n > 1 and nn == n:
            distinctness = d / n
            if (d == n) if exact else (distinctness >= unique_min_distinctness):
                rows.append((c, "is_unique", 1.0, None, distinctness, n))
        if c in values and values[c]:
            rows.append((
                c, "is_contained_in", 1.0,
                VALUE_SEP.join(values[c]), float(d), n,
            ))
    rows.sort(key=lambda r: (r[0], r[1]))
    spark = SparkSession.getActiveSession() or df.sparkSession
    return spark.createDataFrame(rows, _SCHEMA)


def check_from_suggestions(
    suggestions, name: str = "suggested",
) -> "Check":  # noqa: F821
    """Compile suggestion rows (the DataFrame from
    :func:`suggest_rules`, or its collected rows) into a runnable
    ``Check`` — the closed loop: by construction the check passes on
    the snapshot that produced it, and a later snapshot failing it has
    materially changed (new NULLs, out-of-range values, domain growth,
    key collisions)."""
    from .checks import Check

    if isinstance(suggestions, DataFrame):
        suggestions = suggestions.collect()
    chk = Check(name)
    for r in suggestions:
        rule, col = r["rule"], r["column"]
        if rule == "is_complete":
            chk.is_complete(col)
        elif rule == "has_completeness":
            chk.has_completeness(col, r["threshold"])
        elif rule == "has_min":
            chk.has_min(col, at_least=r["threshold"])
        elif rule == "has_max":
            chk.has_max(col, at_most=r["threshold"])
        elif rule == "is_non_negative":
            chk.is_non_negative(col)
        elif rule == "is_unique":
            chk.is_unique(col)
        elif rule == "is_contained_in":
            chk.is_contained_in(col, r["allowed"].split(VALUE_SEP))
        else:  # pragma: no cover - forward compat
            raise ValueError(f"unknown suggested rule {rule!r}")
    return chk


def suggest_from_state(
    state: DataFrame,
    numeric_cols: list[str],
    key_cols: list[str] = (),
    unique_min_distinctness: float = 0.98,
) -> DataFrame:
    """Propose rules from a (merged) mergeable stats state
    (``operators/states.stats_state`` / ``merge_stats_states``) — ZERO
    scans of the data. Completes the never-rescan loop: each crawl
    folds its slice state into the store, and the rules that guard the
    next crawl are suggested from the store alone.

    Covers the state-derivable subset of :func:`suggest_rules`:
    completeness + numeric range + non-negativity per numeric column,
    and key-ness per key column from the HLL estimate (the
    ``exact=False`` rule: estimate/n >= ``unique_min_distinctness``;
    the state has no per-key null counts, so — as with deequ's
    approximate rule — key completeness is not asserted). Categorical
    domains need observed value sets the state does not carry; use
    :func:`suggest_rules` on a snapshot for those. Output rows are
    schema-compatible with :func:`check_from_suggestions`.
    """
    from .states import stats_from_state

    derived = stats_from_state(state, numeric_cols, key_cols).collect()
    if len(derived) != 1:
        raise ValueError(
            "suggest_from_state expects one merged state row; "
            f"got {len(derived)} (pass group_by-free, merged state)"
        )
    d = derived[0].asDict()
    n = d["n_rows"]
    rows: list[tuple] = []
    for c in numeric_cols:
        cnt, nulls = d[f"{c}_cnt"], d[f"{c}_nulls"]
        comp = (cnt / n) if n > 0 else None
        if n > 0 and nulls == 0:
            rows.append((c, "is_complete", 1.0, None, comp, n))
        elif n > 0 and cnt > 0:
            rows.append((c, "has_completeness", _floor4(comp), None, comp, n))
        if cnt and cnt > 0:
            lo, hi = d[f"{c}_min"], d[f"{c}_max"]
            rows.append((c, "has_min", lo, None, lo, n))
            rows.append((c, "has_max", hi, None, hi, n))
            if lo >= 0:
                rows.append((c, "is_non_negative", 1.0, None, lo, n))
    for c in key_cols:
        est = d[f"{c}_cardinality"]
        if n > 1 and est is not None:
            distinctness = est / n
            if distinctness >= unique_min_distinctness:
                rows.append((c, "is_unique", 1.0, None, distinctness, n))
    rows.sort(key=lambda r: (r[0], r[1]))
    spark = SparkSession.getActiveSession() or state.sparkSession
    return spark.createDataFrame(rows, _SCHEMA)
