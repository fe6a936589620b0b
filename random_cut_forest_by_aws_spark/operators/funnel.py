"""Single-scan quality-filter funnel with per-stage drop accounting.

A corpus cleaning pipeline is an ordered chain of predicates (length
bounds, language, quality score, repetition caps, ...). Running each
filter as its own job reads the corpus N times and loses WHERE each
document died. This operator evaluates the whole chain in ONE pass:

* every row is charged to its FIRST failing stage (``first_fail`` CASE
  chain, fused into the scan — pure JVM expressions, no UDFs);
* the funnel report (rows dropped per stage + rows remaining after it)
  comes out of ONE global aggregate — per-stage conditional counts plus
  the total in a single partial-aggregated row (each task ships one
  row), then ``inline`` unpacks it into stage rows with running-total
  arithmetic on the aggregate columns. No joins, no windows, no second
  scan: the report costs one corpus scan at any data size;
* the surviving DataFrame reuses the same predicate chain as a plain
  conjunctive filter (Catalyst pushes it into the scan).

NULL predicate results count as FAILURES (a quality rule that cannot
evaluate should quarantine, not pass) — predicates are wrapped in
``coalesce(p, false)``.

Predicates are accepted as SQL strings so the driver gate's DuckDB
oracle can replay the IDENTICAL text; keep them in the ANSI subset both
engines parse alike.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _first_fail(stages: list[tuple[str, str]]):
    expr = F.lit(0)
    for i in range(len(stages) - 1, -1, -1):
        _, pred = stages[i]
        ok = F.coalesce(F.expr(pred), F.lit(False))
        expr = F.when(~ok, F.lit(i + 1)).otherwise(expr)
    return expr


def filter_funnel(
    df: DataFrame, stages: list[tuple[str, str]]
) -> tuple[DataFrame, DataFrame]:
    """Return ``(survivors, report)``.

    ``stages`` is an ordered list of (name, sql_predicate). ``report``
    has one row per stage: ``stage_idx`` (1-based), ``stage``,
    ``dropped`` (rows whose first failure is this stage) and
    ``remaining`` (rows alive after the stage)."""
    if not stages:
        raise ValueError("need at least one stage")
    names = [n for n, _ in stages]
    if len(set(names)) != len(names):
        raise ValueError("stage names must be unique")

    k = len(stages)
    one = df.select(_first_fail(stages).alias("__ff")).agg(
        F.count(F.lit(1)).cast("bigint").alias("__total"),
        *[
            # coalesce: F.sum over ZERO rows is NULL, not 0 — an empty
            # input must report dropped=0 / remaining=0, not NULLs
            F.coalesce(
                F.sum(F.when(F.col("__ff") == i + 1, 1).otherwise(0)),
                F.lit(0),
            )
            .cast("bigint")
            .alias(f"__d{i + 1}")
            for i in range(k)
        ],
    )
    rows = []
    cum = None
    for i, name in enumerate(names):
        d_i = F.col(f"__d{i + 1}")
        cum = d_i if cum is None else cum + d_i
        rows.append(
            F.struct(
                F.lit(i + 1).alias("stage_idx"),
                F.lit(name).alias("stage"),
                d_i.alias("dropped"),
                (F.col("__total") - cum).cast("bigint").alias("remaining"),
            )
        )
    report = one.select(F.inline(F.array(*rows)))

    keep = F.lit(True)
    for _, pred in stages:
        keep = keep & F.coalesce(F.expr(pred), F.lit(False))
    return df.filter(keep), report


def funnel_report(df: DataFrame, stages: list[tuple[str, str]]) -> DataFrame:
    """Just the per-stage accounting (one corpus scan)."""
    _, report = filter_funnel(df, stages)
    return report
