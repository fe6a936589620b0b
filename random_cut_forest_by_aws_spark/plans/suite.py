"""ValidationSuite — the engine's top-level plan (north_rule end-to-end).

Composes the operators into one validation run over a tokenized-sequence
table and emits three result tables (the engine's analogue of the
reference's ``AnomalyDescriptor`` stream, re-shaped for batch validation):

* ``verdicts``  — one row per (check, scope): passed / violation counts;
* ``violations`` — bounded per-row evidence (duplicate keys, broken refs,
  invariant failures, drift anomalies / drifted windows);
* ``metrics``   — per-scope lineage: rows, tokens, per-check durations.

Plan shape (what Catalyst sees): the stats/uniqueness/invariant checks are
independent aggregations over one cached scan; referential is a broadcast
anti-join; drift is a single groupBy→applyInPandas. Nothing here collects
raw data to the driver — every output is itself a (small) DataFrame.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.features import token_features
from ..operators.constraints import token_equality_violations
from ..operators.drift import DriftConfig, drift_anomalies, drift_scores, drift_verdicts
from ..operators.referential import referential_violations
from ..operators.stats import column_stats
from ..operators.uniqueness import uniqueness_violations


@dataclass
class SuiteConfig:
    key_cols: tuple[str, ...] = ("doc_id",)
    group_col: str = "source"
    order_col: str = "seq"
    tokens_col: str = "tokens"
    n_tok_col: str = "n_tok"
    max_violation_rows: int = 1000  # evidence cap per check
    drift: DriftConfig = field(default_factory=DriftConfig)
    vocab: int = 50_000


@dataclass
class ValidationResult:
    verdicts: DataFrame
    violations: DataFrame
    metrics: DataFrame
    stats: DataFrame


VERDICT_SCHEMA = "check string, scope string, passed boolean, violation_count long, detail string"
VIOLATION_SCHEMA = "check string, scope string, key string, detail string"


class ValidationSuite:
    """Run schema/constraint/drift validation over a sequences DataFrame."""

    def __init__(self, spark: SparkSession, cfg: SuiteConfig | None = None):
        self.spark = spark
        self.cfg = cfg or SuiteConfig()

    def run(self, df: DataFrame, ref_dim: DataFrame | None = None) -> ValidationResult:
        cfg = self.cfg
        t0 = time.time()
        timings: list[tuple[str, float, int]] = []

        # ---- stage 1: per-column stats (pure agg, one pass) ------------
        t = time.time()
        stats = column_stats(
            df,
            numeric_cols=[cfg.n_tok_col],
            key_cols=list(cfg.key_cols),
            group_by=[cfg.group_col],
        ).cache()
        n_stats = stats.count()
        timings.append(("column_stats", time.time() - t, n_stats))

        verdict_dfs: list[DataFrame] = []
        violation_dfs: list[DataFrame] = []

        # null-rate / range verdicts straight from the stats table
        verdict_dfs.append(
            stats.select(
                F.lit("n_tok_positive").alias("check"),
                F.col(cfg.group_col).cast("string").alias("scope"),
                (F.col(f"{cfg.n_tok_col}_min") > 0).alias("passed"),
                F.lit(0).cast("long").alias("violation_count"),
                F.concat_ws(
                    "=", F.lit("n_tok_min"), F.col(f"{cfg.n_tok_col}_min").cast("string")
                ).alias("detail"),
            )
        )
        verdict_dfs.append(
            stats.select(
                F.lit("doc_id_not_null").alias("check"),
                F.col(cfg.group_col).cast("string").alias("scope"),
                (F.col(f"{cfg.n_tok_col}_nulls") == 0).alias("passed"),
                F.col(f"{cfg.n_tok_col}_nulls").cast("long").alias("violation_count"),
                F.lit("n_tok null count").alias("detail"),
            )
        )

        # ---- stage 2: uniqueness (salted two-phase agg) -----------------
        t = time.time()
        dup = uniqueness_violations(df, list(cfg.key_cols)).cache()
        n_dup = dup.count()
        timings.append(("uniqueness", time.time() - t, n_dup))
        key = F.concat_ws("|", *[F.col(k).cast("string") for k in cfg.key_cols])
        verdict_dfs.append(
            self.spark.createDataFrame(
                [("uniqueness", "<table>", n_dup == 0, n_dup, f"keys={list(cfg.key_cols)}")],
                VERDICT_SCHEMA,
            )
        )
        violation_dfs.append(
            dup.select(
                F.lit("uniqueness").alias("check"),
                F.lit("<table>").alias("scope"),
                key.alias("key"),
                F.concat_ws("=", F.lit("dup_count"), F.col("dup_count").cast("string")).alias(
                    "detail"
                ),
            ).limit(cfg.max_violation_rows)
        )

        # ---- stage 3: referential (broadcast anti-join) ------------------
        if ref_dim is not None:
            t = time.time()
            refv = referential_violations(df, ref_dim, [cfg.group_col]).cache()
            n_ref = refv.count()
            timings.append(("referential", time.time() - t, n_ref))
            verdict_dfs.append(
                self.spark.createDataFrame(
                    [("referential", "<table>", n_ref == 0, n_ref, f"fk={cfg.group_col}")],
                    VERDICT_SCHEMA,
                )
            )
            violation_dfs.append(
                refv.select(
                    F.lit("referential").alias("check"),
                    F.lit("<table>").alias("scope"),
                    F.col(cfg.group_col).cast("string").alias("key"),
                    F.concat_ws(
                        "=", F.lit("fact_rows"), F.col("fact_rows").cast("string")
                    ).alias("detail"),
                ).limit(cfg.max_violation_rows)
            )

        # ---- stage 4: per-row token invariants (narrow scan) -------------
        t = time.time()
        inv = token_equality_violations(
            df,
            tokens_col=cfg.tokens_col,
            n_tok_col=cfg.n_tok_col,
            id_cols=(list(cfg.key_cols) + [cfg.group_col, cfg.order_col]),
        ).cache()
        n_inv = inv.count()
        timings.append(("token_invariants", time.time() - t, n_inv))
        verdict_dfs.append(
            self.spark.createDataFrame(
                [
                    (
                        "token_array_equality",
                        "<table>",
                        n_inv == 0,
                        n_inv,
                        "n_tok==size(tokens), tokens non-null & in range",
                    )
                ],
                VERDICT_SCHEMA,
            )
        )
        violation_dfs.append(
            inv.select(
                F.lit("token_array_equality").alias("check"),
                F.col(cfg.group_col).cast("string").alias("scope"),
                F.col(cfg.order_col).cast("string").alias("key"),
                F.concat_ws(",", "failed_constraints").alias("detail"),
            ).limit(cfg.max_violation_rows)
        )

        # ---- stage 5: distribution drift (RCF sketches) -------------------
        t = time.time()
        feat = df.withColumn(
            "features", token_features(cfg.tokens_col, cfg.n_tok_col, cfg.vocab)
        ).select(cfg.group_col, cfg.order_col, "features")
        raw = drift_scores(
            feat, "features", (cfg.group_col,), cfg.order_col, cfg.drift
        ).cache()
        dv = drift_verdicts(raw, (cfg.group_col,), cfg.drift).cache()
        n_drifted = dv.filter(~F.col("passed")).count()
        timings.append(("drift", time.time() - t, n_drifted))
        verdict_dfs.append(
            dv.select(
                F.lit("distribution_drift").alias("check"),
                F.col(cfg.group_col).cast("string").alias("scope"),
                F.coalesce(F.col("passed"), F.lit(True)).alias("passed"),
                F.col("n_drifted_windows").cast("long").alias("violation_count"),
                F.concat_ws(
                    " ",
                    F.lit("windows"),
                    F.col("n_windows").cast("string"),
                    F.lit("mean_score"),
                    F.round("mean_score", 4).cast("string"),
                ).alias("detail"),
            )
        )
        violation_dfs.append(
            drift_anomalies(raw)
            .select(
                F.lit("drift_anomaly").alias("check"),
                F.col(cfg.group_col).cast("string").alias("scope"),
                F.col(cfg.order_col).cast("string").alias("key"),
                F.concat_ws(
                    " ",
                    F.lit("score"),
                    F.round("score", 4).cast("string"),
                    F.lit("grade"),
                    F.round("grade", 4).cast("string"),
                ).alias("detail"),
            )
            .limit(cfg.max_violation_rows)
        )

        verdicts = verdict_dfs[0]
        for v in verdict_dfs[1:]:
            verdicts = verdicts.unionByName(v)
        violations = violation_dfs[0]
        for v in violation_dfs[1:]:
            violations = violations.unionByName(v)

        # ---- lineage / metrics table -------------------------------------
        wall = time.time() - t0
        metrics_rows = [
            (check, float(dur), int(n), float(wall)) for check, dur, n in timings
        ]
        metrics = self.spark.createDataFrame(
            metrics_rows, "check string, duration_sec double, output_rows long, wall_sec double"
        )
        return ValidationResult(verdicts, violations, metrics, stats)
