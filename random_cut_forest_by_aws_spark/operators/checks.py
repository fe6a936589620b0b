"""Declarative constraint checks — the deequ-style ``Check`` builder.

The suite's fixed checks (stats / uniqueness / referential / drift)
cover the engine's own invariants; production tables also carry
table-specific rules ("lang must be one of ...", "99% of rows must have
n_chars >= 10", "mean length between A and B"). This module gives those
rules a declarative surface that compiles the WHOLE rule set into ONE
conditional aggregate over ONE scan — the same scan-sharing idea as
deequ's analyzer runner, expressed directly in Catalyst:

* every row-level rule becomes a ``sum(case when coalesce(pred, false)
  then 1 else 0 end)`` column in a single partial-aggregated pass (each
  task ships one row across the exchange regardless of input size);
* every aggregate-level rule (min/max/mean/sum/size/distinctness) adds
  its aggregate expression to the SAME pass — ``count(distinct)`` plans
  an Expand but still reads the scan once;
* the verdict table is an ``inline`` unpack of the single aggregated
  row: one verdict row per constraint, nothing row-scale past the
  aggregate, no driver collect.

NULL predicate results count as FAILURES (a rule that cannot evaluate
should quarantine, not pass). Predicates are accepted as SQL strings in
the ANSI subset both Spark and DuckDB parse alike, so the driver gate's
oracle replays the IDENTICAL text; regexes should stay in the Java∩RE2
dialect subset (see operators/scrub.py).

Reference analogue: the reference engine validates per-row token
invariants inside its test harness (SURVEY §5); this is the
user-facing generalization the north-star "constraint validation
engine" calls for (cf. deequ's ``Check``/``VerificationSuite``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_OPS = {">=", "<="}

#: builder methods reachable from JSON specs (plans/job.py --rules-json)
_SPEC_METHODS = frozenset({
    "satisfies", "is_complete", "has_completeness", "is_contained_in",
    "has_pattern", "is_non_negative", "has_min", "has_max", "has_mean",
    "has_sum", "has_size", "has_distinctness", "is_unique",
    "has_correlation",
})


@dataclass(frozen=True)
class _Rule:
    kind: str  # 'frac' (row predicate) | 'agg'
    name: str
    column: str
    predicate: str | None  # SQL predicate for kind='frac'
    agg: str | None  # 'min'|'max'|'mean'|'sum'|'size'|'distinctness'|'corr'
    op: str
    threshold: float
    column2: str | None = None  # second column for 'corr'


def check_from_spec(spec: dict) -> "Check":
    """Build a Check from a JSON-able spec — the spark-submit surface
    (``plans/job.py --rules-json``) so declarative rules ship as config,
    not code::

        {"name": "docs_rules", "rules": [
            {"type": "is_complete", "column": "text"},
            {"type": "satisfies", "predicate": "n_chars >= 10",
             "name": "min_chars", "min_fraction": 0.99},
            {"type": "has_mean", "column": "n_chars", "at_most": 1e6}]}

    ``type`` names a builder method; remaining keys are its kwargs.
    """
    chk = Check(spec["name"], round_dp=int(spec.get("round_dp", 6)))
    rules = spec.get("rules") or ()
    if not rules:
        raise ValueError(f"check {spec.get('name')!r}: empty rules list")
    for rule in rules:
        kw = dict(rule)
        typ = kw.pop("type", None)
        if typ not in _SPEC_METHODS:
            raise ValueError(
                f"unknown rule type {typ!r}; allowed: {sorted(_SPEC_METHODS)}"
            )
        getattr(chk, typ)(**kw)
    return chk


class Check:
    """Chainable constraint set over one DataFrame, one scan.

    >>> verdicts = (Check("docs")
    ...     .is_complete("text")
    ...     .is_contained_in("lang", ["en", "de", "fr"])
    ...     .satisfies("n_chars >= 10", "min_chars", min_fraction=0.99)
    ...     .has_min("n_chars", at_least=0)
    ...     .has_mean("n_chars", at_most=1e6)
    ...     .is_unique("doc_id")
    ...     .run(df))
    """

    def __init__(self, name: str, round_dp: int = 6):
        self.name = name
        self.round_dp = round_dp
        self._rules: list[_Rule] = []

    # -- row-predicate rules (metric = satisfied fraction) ------------

    def satisfies(
        self, predicate: str, name: str, min_fraction: float = 1.0,
        column: str = "",
    ) -> "Check":
        """At least ``min_fraction`` of rows satisfy the SQL predicate.
        NULL predicate results fail."""
        self._rules.append(_Rule("frac", name, column, predicate, None,
                                 ">=", float(min_fraction)))
        return self

    def is_complete(self, column: str) -> "Check":
        return self.satisfies(f"{column} IS NOT NULL",
                              f"complete({column})", 1.0, column)

    def has_completeness(self, column: str, min_fraction: float) -> "Check":
        return self.satisfies(f"{column} IS NOT NULL",
                              f"completeness({column})", min_fraction, column)

    def is_contained_in(
        self, column: str, allowed: list[str], min_fraction: float = 1.0
    ) -> "Check":
        vals = ", ".join("'" + v.replace("'", "''") + "'" for v in allowed)
        return self.satisfies(f"{column} IN ({vals})",
                              f"contained({column})", min_fraction, column)

    def has_pattern(
        self, column: str, regex: str, min_fraction: float = 1.0
    ) -> "Check":
        """Keep ``regex`` in the Java∩RE2 dialect subset so the DuckDB
        oracle replay agrees (no lookaround, no \\p posix classes)."""
        esc = regex.replace("'", "''")
        return self.satisfies(f"regexp_like({column}, '{esc}')",
                              f"pattern({column})", min_fraction, column)

    def is_non_negative(self, column: str, min_fraction: float = 1.0) -> "Check":
        return self.satisfies(f"{column} >= 0",
                              f"non_negative({column})", min_fraction, column)

    # -- aggregate rules (metric = the aggregate itself) ---------------

    def _agg(self, agg: str, column: str, at_least, at_most) -> "Check":
        if at_least is None and at_most is None:
            raise ValueError(f"{agg}({column}): need at_least and/or at_most")
        if at_least is not None:
            self._rules.append(_Rule("agg", f"{agg}({column})>=", column,
                                     None, agg, ">=", float(at_least)))
        if at_most is not None:
            self._rules.append(_Rule("agg", f"{agg}({column})<=", column,
                                     None, agg, "<=", float(at_most)))
        return self

    def has_min(self, column: str, at_least=None, at_most=None) -> "Check":
        return self._agg("min", column, at_least, at_most)

    def has_max(self, column: str, at_least=None, at_most=None) -> "Check":
        return self._agg("max", column, at_least, at_most)

    def has_mean(self, column: str, at_least=None, at_most=None) -> "Check":
        """Mean computed as sum/count explicitly (identical expression
        shape in the oracle)."""
        return self._agg("mean", column, at_least, at_most)

    def has_sum(self, column: str, at_least=None, at_most=None) -> "Check":
        return self._agg("sum", column, at_least, at_most)

    def has_size(self, at_least=None, at_most=None) -> "Check":
        return self._agg("size", "*", at_least, at_most)

    def has_correlation(self, column_a: str, column_b: str,
                        at_least=None, at_most=None) -> "Check":
        """Pearson correlation of two numeric columns from the SAME
        single-pass aggregate: rows where either side is NULL are
        excluded pairwise (SQL corr semantics), metric =
        (n·Σxy − Σx·Σy) / (√(n·Σxx − Σx²) · √(n·Σyy − Σy²)). The
        one-pass moment formula is engine-consistent (an oracle can
        replay the identical shape); NULL (fail closed) when either
        variance is 0 or no complete pairs exist."""
        if at_least is None and at_most is None:
            raise ValueError(
                f"corr({column_a},{column_b}): need at_least and/or at_most"
            )
        pair = f"corr({column_a},{column_b})"
        if at_least is not None:
            self._rules.append(_Rule("agg", f"{pair}>=", column_a, None,
                                     "corr", ">=", float(at_least), column_b))
        if at_most is not None:
            self._rules.append(_Rule("agg", f"{pair}<=", column_a, None,
                                     "corr", "<=", float(at_most), column_b))
        return self

    def has_distinctness(self, column: str, at_least: float) -> "Check":
        """count(distinct column) / count(*) — EXACT (plans an Expand,
        still one scan)."""
        return self._agg("distinctness", column, at_least, None)

    def is_unique(self, column: str) -> "Check":
        """Exact uniqueness as distinctness == 1.0. For the violating
        KEYS themselves use operators/uniqueness.py (grouped evidence
        needs its own shuffle by design)."""
        return self.has_distinctness(column, 1.0)

    # -- compilation ----------------------------------------------------

    def run(self, df: DataFrame, group_by: tuple[str, ...] = ()) -> DataFrame:
        """One verdict row per constraint (× group when ``group_by`` is
        set — per-partition pass/fail, e.g. every source must satisfy
        the rule set independently):
        ``(group..., check, constraint, column, metric, op, threshold,
        passed, n_rows, n_violations)`` — ``n_violations`` is the
        failing-row count for row-predicate rules and -1 for aggregate
        rules (no per-row notion of violation). Grouped or not, the
        whole rule set stays ONE aggregate over ONE scan; grouped runs
        shuffle only the per-group aggregate rows."""
        if not self._rules:
            raise ValueError("Check has no constraints")
        names = [r.name for r in self._rules]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate constraint names: {names}")
        group_by = list(group_by)

        aggs: list[Column] = [F.count(F.lit(1)).cast("bigint").alias("__n")]
        for i, r in enumerate(self._rules):
            if r.kind == "frac":
                ok = F.coalesce(F.expr(r.predicate), F.lit(False))
                aggs.append(
                    F.coalesce(F.sum(F.when(ok, 1).otherwise(0)), F.lit(0))
                    .cast("bigint").alias(f"__s{i}")
                )
            elif r.agg == "size":
                pass  # reuses __n
            elif r.agg == "distinctness":
                aggs.append(F.countDistinct(F.col(r.column))
                            .cast("bigint").alias(f"__s{i}"))
            elif r.agg == "mean":
                # explicit sum + count of non-null values: the oracle
                # replays SUM(col)/COUNT(col), same expression shape
                aggs.append(F.sum(F.col(r.column).cast("double"))
                            .alias(f"__s{i}"))
                aggs.append(F.count(F.col(r.column))
                            .cast("bigint").alias(f"__c{i}"))
            elif r.agg == "corr":
                # pairwise-complete moments for one-pass Pearson
                both = F.col(r.column).isNotNull() & F.col(r.column2).isNotNull()
                x = F.when(both, F.col(r.column).cast("double"))
                y = F.when(both, F.col(r.column2).cast("double"))
                aggs.append(F.count(x).cast("double").alias(f"__n{i}"))
                aggs.append(F.sum(x).alias(f"__x{i}"))
                aggs.append(F.sum(y).alias(f"__y{i}"))
                aggs.append(F.sum(x * x).alias(f"__xx{i}"))
                aggs.append(F.sum(y * y).alias(f"__yy{i}"))
                aggs.append(F.sum(x * y).alias(f"__xy{i}"))
            else:  # min | max | sum
                fn = {"min": F.min, "max": F.max, "sum": F.sum}[r.agg]
                aggs.append(fn(F.col(r.column).cast("double"))
                            .alias(f"__s{i}"))
        one = df.groupBy(*group_by).agg(*aggs) if group_by else df.agg(*aggs)

        n = F.col("__n")
        nd = n.cast("double")
        rows = []
        for i, r in enumerate(self._rules):
            if r.kind == "frac":
                s = F.col(f"__s{i}")
                metric = F.when(n > 0, s.cast("double") / nd)
                nviol = (n - s).cast("bigint")
            elif r.agg == "size":
                metric = nd
                nviol = F.lit(-1).cast("bigint")
            elif r.agg == "distinctness":
                metric = F.when(n > 0, F.col(f"__s{i}").cast("double") / nd)
                nviol = F.lit(-1).cast("bigint")
            elif r.agg == "mean":
                c = F.col(f"__c{i}")
                metric = F.when(c > 0, F.col(f"__s{i}") / c.cast("double"))
                nviol = F.lit(-1).cast("bigint")
            elif r.agg == "corr":
                np_, sx = F.col(f"__n{i}"), F.col(f"__x{i}")
                sy = F.col(f"__y{i}")
                vx = np_ * F.col(f"__xx{i}") - sx * sx
                vy = np_ * F.col(f"__yy{i}") - sy * sy
                metric = F.when(
                    (vx > 0) & (vy > 0),
                    (np_ * F.col(f"__xy{i}") - sx * sy)
                    / (F.sqrt(vx) * F.sqrt(vy)),
                )
                nviol = F.lit(-1).cast("bigint")
            else:
                metric = F.col(f"__s{i}")
                nviol = F.lit(-1).cast("bigint")
            cmp = (metric >= F.lit(r.threshold)) if r.op == ">=" \
                else (metric <= F.lit(r.threshold))
            rows.append(F.struct(
                F.lit(self.name).alias("check"),
                F.lit(r.name).alias("constraint"),
                F.lit(r.column).alias("column"),
                F.round(metric, self.round_dp).alias("metric"),
                F.lit(r.op).alias("op"),
                F.lit(r.threshold).alias("threshold"),
                F.coalesce(cmp, F.lit(False)).alias("passed"),
                n.alias("n_rows"),
                nviol.alias("n_violations"),
            ))
        return one.select(*group_by, F.inline(F.array(*rows)))
