"""Deterministic train/validation/test split assignment.

The training-pipeline property that matters is NOT exact proportions —
it is that a document's split is a pure function of its identity:

* **stable under corpus growth**: adding or removing other documents
  never moves a doc between splits (rank- or RNG-based splitters fail
  this), so eval sets stay frozen across incremental backfills;
* **leakage-safe under grouping**: passing ``group_col`` (e.g. the
  canonical id from ``dedup.duplicate_clusters``, or a domain key)
  hashes the GROUP identity, so near-duplicates / same-site pages can
  never straddle train and test;
* **engine-portable**: the decision is the same multiplicative-
  congruential hash as ``mixing.sample_hash`` — plain integer
  arithmetic fused into the scan (no shuffle, no RNG state), replayable
  verbatim in the DuckDB gate oracle.

Exact per-key counts (fixed-size dev sets) are a different tool:
``sampling.quota_sample``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .mixing import sample_hash


def split_column(
    splits: dict[str, float],
    key_col: str = "doc_id",
    seed: int = 42,
) -> Column:
    """CASE chain mapping the deterministic per-key uniform to a split
    name. Thresholds are cumulative in the dict's insertion order (the
    order is part of the contract — document it with the split spec).
    Fractions must sum to 1 within 1e-9; the LAST split takes the
    closing boundary so every row is assigned exactly once.

    A NULL key gets a NULL split — never a silent default (a NULL
    hash would skip every WHEN and fall into the last split, silently
    contaminating the eval set; loud NULLs surface the upstream join
    that should have been coalesced)."""
    names = list(splits)
    fracs = [float(splits[n]) for n in names]
    if len(names) < 2:
        raise ValueError("need at least two splits")
    if any(f <= 0 for f in fracs):
        raise ValueError("split fractions must be positive")
    total = sum(fracs)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    u = sample_hash(key_col, seed)
    expr: Column = F.lit(names[-1])
    acc = 0.0
    # build WHEN u < c1 THEN s1 WHEN u < c1+c2 THEN s2 ... ELSE s_last
    conds = []
    for n, f in zip(names[:-1], fracs[:-1]):
        acc += f
        conds.append((n, acc))
    for n, c in reversed(conds):
        expr = F.when(u < F.lit(c), F.lit(n)).otherwise(expr)
    return F.when(F.col(key_col).isNull(), F.lit(None).cast("string")).otherwise(expr)


def assign_splits(
    df: DataFrame,
    splits: dict[str, float],
    key_col: str = "doc_id",
    group_col: str | None = None,
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """Append ``out_col`` with the split name for every row.

    ``group_col`` switches the hashed identity from the row key to the
    group key — all rows sharing a group land in the same split (the
    leakage guard). Keys must be integral (fold-multiply hash); hash
    string keys to a stable integer first (e.g. ``F.xxhash64`` — then
    the assignment is rows-only for the cross-engine oracle, which is
    why the gate query uses the integral ``doc_id``)."""
    key = group_col if group_col is not None else key_col
    return df.withColumn(out_col, split_column(splits, key, seed))
