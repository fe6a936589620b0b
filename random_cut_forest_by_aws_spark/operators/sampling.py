"""Exact-quota deterministic sampling: keep exactly min(K, n) documents
per key, chosen by a deterministic hash order.

Mixture sampling (operators/mixing.py) keeps each row with probability
w — the right tool for ratios, but the realized count fluctuates.
Pipelines also need the other contract: "exactly K docs per domain,
reproducibly" (eval carve-outs, per-domain caps, fixed-size dev sets).
That is a per-key top-K under a deterministic total order — here
(hash(id), id), using the same engine-portable multiplicative hash as
operators/mixing.py so the gate oracle replays the order in SQL.

Scale shape: a naive ``row_number() OVER (PARTITION BY key)`` sorts an
entire key in one task. Instead the top-K runs in two phases:

1. rows salt into ``salt_buckets`` sub-partitions by id; a window over
   (key, salt) keeps each bucket's local top-K — partitions are
   ~n_key/salt_buckets rows, and the global top-K is provably contained
   in the union of bucket top-Ks under ANY disjoint bucketing;
2. an exact rank over the surviving ≤ salt_buckets·K rows per key
   applies the final cut — bounded work no matter how large the key.

Size ``salt_buckets ≈ n_largest_key / rows_per_task`` upward as the
corpus grows; correctness is bucketing-invariant (unit-tested at 1, 2,
7, 64), only task granularity changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .mixing import _KNUTH, _M


def order_hash(id_col: str = "doc_id", seed: int = 42) -> Column:
    """Deterministic bigint in [0, 2^31): the integer form of
    mixing.sample_hash (same fold-then-multiply arithmetic, undivided) —
    integer comparisons are exact in every engine, so ordering by
    (order_hash, id) is an engine-portable total order."""
    folded = F.pmod(F.col(id_col), F.lit(_M))
    return F.pmod(folded * F.lit(_KNUTH) + F.lit(seed), F.lit(_M)).cast("bigint")


def quota_sample(
    df: DataFrame,
    quota: int | dict[str, int],
    key_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
    salt_buckets: int = 64,
    default_quota: int = 0,
) -> DataFrame:
    """Keep exactly min(quota, group size) rows per ``key_col`` group,
    the ones ranking first under the deterministic (hash(id), id) order.

    ``quota`` is a single cap or a per-key dict (``{"web": 1_000_000,
    "books": 250_000}`` — the usual mixture spec); keys absent from the
    dict get ``default_quota`` (0 ⇒ dropped entirely). Dicts resolve as
    a literal CASE chain — mixes have tens of domains; broadcast-join a
    quota table instead for high-cardinality keys.

    Returns the input columns plus ``sample_rank`` (1..quota within the
    key). Reruns and backfills select the identical rows; adding new
    documents to a key only displaces the current highest-ranked ones.
    The two-phase cut stays exact per key: phase 1 keeps each salt
    bucket's top-(that key's quota), and a key's global top-K is
    contained in the union of its buckets' top-Ks.
    """
    if isinstance(quota, dict):
        if any(q < 0 for q in quota.values()) or default_quota < 0:
            raise ValueError(f"quotas must be non-negative, got {quota}")
        qcol: Column = F.lit(int(default_quota))
        for key, q in sorted(quota.items()):
            qcol = F.when(F.col(key_col) == F.lit(key), F.lit(int(q))).otherwise(
                qcol
            )
    else:
        if quota <= 0:
            raise ValueError(f"quota must be positive, got {quota}")
        qcol = F.lit(int(quota))
    if salt_buckets <= 0:
        raise ValueError(f"salt_buckets must be positive, got {salt_buckets}")
    qh = order_hash(id_col, seed)
    salted = df.withColumn("_qh", qh).withColumn(
        "_qsalt", F.pmod(F.col(id_col), F.lit(int(salt_buckets)))
    )
    w_local = Window.partitionBy(key_col, "_qsalt").orderBy("_qh", id_col)
    survivors = (
        salted.withColumn("_qr", F.row_number().over(w_local))
        .filter(F.col("_qr") <= qcol)
        .drop("_qr", "_qsalt")
    )
    w_exact = Window.partitionBy(key_col).orderBy("_qh", id_col)
    return (
        survivors.withColumn("sample_rank", F.row_number().over(w_exact))
        .filter(F.col("sample_rank") <= qcol)
        .drop("_qh")
    )
