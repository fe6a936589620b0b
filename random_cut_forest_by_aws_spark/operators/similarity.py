"""Similarity search over embedding columns.

* ``cosine_topk`` — exact brute-force top-k: broadcast the (small) query
  set against the corpus; dot products via JVM higher-order functions
  (zip_with + aggregate), ranked with a window. One scan, no shuffle of
  the corpus beyond the top-k aggregation.
* ``lsh_cosine_topk`` — the scale path: random-hyperplane LSH buckets
  (sign sketch) prune the corpus before exact re-scoring; candidates per
  query drop from N to N/2^bits per table. This mirrors the RCF
  near-neighbor idea (leaf lookup within a partition of space —
  ``RandomCutForest.java:1264-1297``) re-expressed relationally.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """(query_id, vec_id, cosine, rank) — exact top-k per query."""
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv")
        )
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cv"))
    scored = c.crossJoin(q).select(
        "query_id",
        "vec_id",
        (
            _dot(F.col("_qv"), F.col("_cv"))
            / F.greatest(_norm(F.col("_qv")) * _norm(F.col("_cv")), F.lit(1e-12))
        ).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_sketch(vec_col: str, dim: int, bits: int = 16, seed: int = 42) -> Column:
    """Sign sketch: bit i = (v · h_i ≥ 0) for a fixed random hyperplane set
    (deterministic from seed; computed JVM-side as a literal matrix)."""
    rng = np.random.default_rng(seed)
    H = rng.standard_normal((bits, dim))
    bit_exprs = []
    for i in range(bits):
        row = F.array(*[F.lit(float(v)) for v in H[i]])
        proj = F.aggregate(
            F.zip_with(F.col(vec_col), row, lambda x, h: x.cast("double") * h),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit_exprs.append(F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bit_exprs[0]
    for e in bit_exprs[1:]:
        out = out + e
    return out.cast("long")


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    bits: int = 12,
    probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: join on hyperplane-sketch bucket, exact re-score
    inside buckets. ``probes`` > 1 additionally probes buckets at Hamming
    distance 1 from the query's bucket (multi-probe LSH)."""
    sk = hyperplane_sketch(vec_col, dim, bits, seed)
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cv"), sk.alias("_b"))
    qsk = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv"), sk.alias("_qb")
    )
    if probes > 1:
        flips = F.array(F.lit(0), *[F.lit(1 << i) for i in range(bits)])
        qsk = qsk.select(
            "query_id",
            "_qv",
            F.explode(
                F.slice(F.transform(flips, lambda fl: F.col("_qb").bitwiseXOR(fl)), 1, probes)
            ).alias("_qb"),
        )
    joined = c.join(F.broadcast(qsk), c["_b"] == qsk["_qb"])
    scored = joined.select(
        "query_id",
        "vec_id",
        (
            _dot(F.col("_qv"), F.col("_cv"))
            / F.greatest(_norm(F.col("_qv")) * _norm(F.col("_cv")), F.lit(1e-12))
        ).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
