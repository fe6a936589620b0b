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


def _budget_col(budget, key_col: str, default: int, what: str) -> Column:
    """Per-key literal CASE chain for an int-or-dict cap spec (shared by
    quota_sample and token_budget_sample)."""
    if isinstance(budget, dict):
        if any(q < 0 for q in budget.values()) or default < 0:
            raise ValueError(f"{what}s must be non-negative, got {budget}")
        col: Column = F.lit(int(default))
        for key, q in sorted(budget.items()):
            col = F.when(F.col(key_col) == F.lit(key), F.lit(int(q))).otherwise(col)
        return col
    if budget <= 0:
        raise ValueError(f"{what} must be positive, got {budget}")
    return F.lit(int(budget))


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
    qcol = _budget_col(quota, key_col, default_quota, "quota")
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


def token_budget_sample(
    df: DataFrame,
    budget: int | dict[str, int],
    weight_col: str,
    key_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
    n_buckets: int = 64,
    default_budget: int = 0,
) -> DataFrame:
    """Keep the greedy prefix of each ``key_col`` group, in the
    deterministic (hash(id), id) order, until the running sum of
    ``weight_col`` reaches ``budget`` — the token-weighted mixture
    contract: training mixes are specified as "N tokens of web, M tokens
    of books", not doc counts, so the cut must land on a cumulative
    token total, reproducibly.

    A row is kept iff the weight sum of all rows BEFORE it (in hash
    order, within its key) is < the key's budget — so the row that
    crosses the budget is included and the realized total overshoots by
    at most one document. ``budget`` is an int or a per-key dict (keys
    absent from the dict get ``default_budget``; 0 ⇒ dropped). Weights
    must be non-negative; NULL weights count as 0 (kept for free inside
    the prefix).

    Scale shape — the same hierarchical prefix sum as
    ``packing.pack_sequences``: a naive cumulative window sorts each
    whole key in one task. Instead rows land in ``n_buckets`` RANGES of
    the hash order (bucket = qh // span — ranges, not arbitrary salts,
    so bucket order == hash order); the row-level prefix sum runs
    bucket-locally (each task sorts ~n_key/n_buckets rows), bucket
    totals derive from the same window output (one scan + one corpus
    exchange, ReusedExchange), and bucket offsets come from a window
    over the tiny (keys × buckets) table. The prefix machinery sees only
    (key, id, weight) — payload (text, embeddings) never rides the
    prefix exchange; survivors re-attach it through one id join that AQE
    broadcasts when the kept set fits. Rows with NULL key or id are
    dropped (no position in the per-key hash order), and ``id_col`` must
    be unique — duplicate ids would make the (hash, id) order
    nondeterministic AND multiply through the payload join (same
    uniqueness contract as ``packing.pack_sequences``' order column).
    Negative weights are clamped to 0 (the hierarchical bucket totals
    require a monotone prefix). Output: the input columns plus
    ``tokens_before`` (the exact prefix sum — the audit trail for the
    cut).

    Reference frame: composes with ``mixing.mixture_sample`` (ratio
    contract) and ``quota_sample`` (doc-count contract); the hash is
    mixing's fold-then-multiply arithmetic so DuckDB replays the order
    exactly (gate query ``token_budget_docs``).
    """
    bcol = _budget_col(budget, "_k", default_budget, "budget")
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    span = (_M + n_buckets - 1) // n_buckets
    # The prefix machinery runs on a NARROW projection (key, id, weight):
    # at corpus scale the payload (text, embeddings) must never ride the
    # prefix-sum exchange — survivors re-attach it once at the end.
    # Explicit null rejection (null key/id rows have no position in the
    # hash order) keeps the bucket-total aggregate and the offsets-join
    # probe canonically identical, so Catalyst plans ONE scan + ONE
    # corpus exchange with a ReusedExchange — the same construction as
    # packing.doc_token_offsets (CLAUDE.md Catalyst gotcha 2).
    if "tokens_before" in df.columns:
        raise ValueError("df already has a 'tokens_before' column")
    base = (
        df.select(
            F.col(key_col).alias("_k"),
            F.col(id_col).alias("_id"),
            # clamp: bucket totals derive as max(prefix + w), which only
            # equals the bucket sum when the running prefix is monotone —
            # a negative sentinel weight would silently corrupt offsets
            F.greatest(
                F.coalesce(F.col(weight_col).cast("bigint"), F.lit(0)),
                F.lit(0),
            ).alias("_w"),
        )
        .withColumn("_qh", order_hash("_id", seed))
        .withColumn("_qb", (F.col("_qh") / F.lit(int(span))).cast("bigint"))
        .filter(
            F.col("_k").isNotNull()
            & F.col("_id").isNotNull()
            & F.col("_qb").isNotNull()
        )
    )
    w_local = (
        Window.partitionBy("_k", "_qb")
        .orderBy("_qh", "_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = base.withColumn(
        "_local_before", F.coalesce(F.sum("_w").over(w_local), F.lit(0))
    )
    # bucket totals derived FROM the window output (last row's prefix +
    # weight == the bucket sum; weights are non-negative) so the
    # aggregate consumes the window — Catalyst can neither prune the
    # window nor plan a second scan, and the partial aggregate runs on
    # the window's own (key, bucket) partitioning.
    bucket_tot = local.groupBy("_k", "_qb").agg(
        F.max(F.col("_local_before") + F.col("_w")).alias("_bt")
    )
    w_off = (
        Window.partitionBy("_k")
        .orderBy("_qb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bucket_tot.select(
        "_k",
        "_qb",
        F.coalesce(F.sum("_bt").over(w_off), F.lit(0)).alias("_off"),
    )
    kept = (
        local.join(F.broadcast(offsets), ["_k", "_qb"])
        .withColumn("tokens_before", F.col("_off") + F.col("_local_before"))
        .filter(F.col("tokens_before") < bcol)
        .select(F.col("_id").alias("_tbs_join_id"), "tokens_before")
    )
    # payload re-attaches once; survivors are budget-bounded (usually a
    # small fraction of the corpus), so AQE converts this to a broadcast
    # join at runtime when they fit — the corpus is never shuffled twice
    return df.join(kept, df[id_col] == kept["_tbs_join_id"]).drop(
        "_tbs_join_id"
    )
