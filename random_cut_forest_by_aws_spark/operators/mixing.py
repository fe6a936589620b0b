"""Deterministic domain-mixture sampling: downsample each source to a
target mixture weight (the "data mixing" step that turns a raw crawl
into a training distribution — cf. The Pile / LLaMA mixture tables).

Spark shape: a per-row keep decision from a multiplicative-congruential
hash of the document id — a pure JVM expression fused into the scan (no
shuffle, no RNG state, no sampling skew across partitions), reproducible
across engines (the gate oracle replays the identical arithmetic in
DuckDB) and across reruns/backfills (the same doc always makes the same
decision, which is what makes incremental pipelines consistent).

The hash is ANSI-safe at any id magnitude: the id is folded into
[0, 2^31) BEFORE the Knuth multiply, so the product stays under 2^63.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_M = 2_147_483_648  # 2^31
_KNUTH = 2_654_435_761


def sample_hash(id_col: str = "doc_id", seed: int = 42) -> Column:
    """Deterministic uniform in [0, 1): ((id mod 2^31)·K + seed) mod 2^31
    scaled — engine-portable integer arithmetic (no xxhash dependency).

    Spark's ``pmod`` is always non-negative; an engine whose ``%``
    follows the dividend's sign (DuckDB, Python) must replay negative
    ids as ``((id % M) + M) % M`` to match (the gate oracles do)."""
    folded = F.pmod(F.col(id_col), F.lit(_M))
    return (
        F.pmod(folded * F.lit(_KNUTH) + F.lit(seed), F.lit(_M)).cast("double")
        / F.lit(float(_M))
    )


def _weight_col(
    weights: dict[str, float], source_col: str, default_weight: float
) -> Column:
    """Literal CASE chain resolving a source to its mixture weight —
    mixtures have tens of domains; high-cardinality mixes should
    broadcast-join a weights table instead."""
    w: Column = F.lit(float(default_weight))
    for src, frac in sorted(weights.items()):
        w = F.when(F.col(source_col) == F.lit(src), F.lit(float(frac))).otherwise(w)
    return w


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    source_col: str = "source",
    seed: int = 42,
    default_weight: float = 0.0,
) -> DataFrame:
    """Keep each row of ``source`` s with probability ``weights[s]``,
    decided by the deterministic per-id hash. Sources absent from
    ``weights`` keep ``default_weight`` (0 ⇒ dropped)."""
    return df.filter(sample_hash(id_col, seed) < _weight_col(weights, source_col, default_weight))


def mixture_resample(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    source_col: str = "source",
    seed: int = 42,
    default_weight: float = 0.0,
) -> DataFrame:
    """Mixture construction with UPSAMPLING: weights may exceed 1
    (epoch factors — e.g. books×2.5, web×0.4 in LLaMA-style mixes). A
    row of weight w emits ``floor(w)`` guaranteed replicas plus one more
    when its deterministic hash falls under ``frac(w)``; the emitted
    ``replica`` column (1..copies) distinguishes the copies downstream.
    Still a stateless scan-fused generator: no shuffle, no RNG state,
    and reruns produce the identical replica set. The explode is guarded
    so copies == 0 drops the row (Spark ``sequence(1, 0)`` would
    silently produce a DESCENDING range, not an empty one)."""
    w = _weight_col(weights, source_col, default_weight)
    base = F.floor(w).cast("long")
    extra = (sample_hash(id_col, seed) < (w - F.floor(w))).cast("long")
    copies = base + extra
    reps = F.when(copies > 0, F.sequence(F.lit(1).cast("long"), copies)).otherwise(
        F.array().cast("array<bigint>")
    )
    return df.withColumn("replica", F.explode(reps))
