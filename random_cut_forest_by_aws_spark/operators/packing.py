"""Sequence packing for LLM pretraining: concatenate each corpus key's
documents in a deterministic order and chunk the token stream into
fixed-budget training sequences ("packs").

This is the concat-and-chunk packing used to build pretraining batches:
documents are laid end-to-end per key (e.g. per source) in ``order_col``
order, and the resulting token stream is split every ``budget`` tokens.
A document whose span crosses a boundary appears in every pack it
overlaps, with its token sub-range within that pack — exactly the rows a
dataloader needs to materialize fixed-length sequences.

Scale design (the part that matters at 10^12 documents): the only
sequential dependency is the per-key prefix sum of token counts, and a
naive ``Window.partitionBy(key)`` serializes an entire key through one
task — a key holding most of the corpus becomes a single-task sort.
Instead the prefix sum is computed HIERARCHICALLY:

1. docs are bucketed by ``order_col div bucket_width`` (unique integer
   ids → at most ``bucket_width`` rows per bucket);
2. per-bucket token sums aggregate with map-side combine (one small
   exchange, output rows = n_docs / bucket_width);
3. bucket offsets are an exclusive window cumsum over that small bucket
   table (n_docs / bucket_width rows per key partition);
4. within-bucket offsets are a window over at most ``bucket_width``
   rows; the doc's global offset is the sum of (3) and (4).

No window partition exceeds ``max(bucket_width, n_docs/bucket_width)``
rows, so ``bucket_width ≈ sqrt(N)`` bounds every per-task sort at about
sqrt(N) regardless of key skew (and the construction recurses if a
second level is ever needed). The pack explode is a narrow map stage.

Reference parity note: the reference engine has no packing operator —
this is one of the prompt-mandated training-data-pipeline additions
(same family as operators/mixing.py and operators/contamination.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def doc_token_offsets(
    docs: DataFrame,
    ntok_col: str,
    key_col: str = "source",
    order_col: str = "doc_id",
    bucket_width: int = 1 << 20,
) -> DataFrame:
    """Per-document exclusive prefix sum of ``ntok_col`` within each
    ``key_col`` group, ordered by ``order_col`` (``cum_before`` = tokens
    emitted by all earlier docs of the same key).

    ``order_col`` must be a non-negative unique integer id — bucketing
    uses integer division, which only agrees with floor (and therefore
    preserves order across bucket boundaries) for non-negative values.
    Zero-token documents are dropped: they occupy no span in the stream.

    The zero-token drop happens AFTER the prefix sum, not before: a
    pre-filter on ``n_tok > 0`` gets pushed below the projection and
    re-evaluates the (often expensive — e.g. a regex token count)
    ``ntok_col`` expression a second time inside the scan's DataFilter,
    doubling the scan cost (measured 2×). Zero/null-token rows
    contribute nothing to any cumsum, so carrying them through the
    shuffle (a few bytes each) and filtering on the materialized column
    afterwards is semantically identical and evaluates the expression
    once.
    """
    from ._parallel import ensure_compute_parallelism

    # the ntok_col expression (often a regex over the full text) is
    # evaluated map-side BEFORE the window exchange; a single-file
    # input would run it on one core (no-op on multi-split inputs)
    docs = ensure_compute_parallelism(docs)
    base = (
        docs.select(
            F.col(key_col).alias("pk_key"),
            F.col(order_col).cast("bigint").alias("pk_order"),
            F.coalesce(F.col(ntok_col).cast("bigint"), F.lit(0)).alias("n_tok"),
        )
        .withColumn("pk_bucket", F.expr(f"pk_order div {int(bucket_width)}"))
        # Null keys/orders have no position in a deterministic stream —
        # drop them explicitly. This also makes the null-rejection filter
        # IDENTICAL in both consumers of `base` below: without it, the
        # join branch gets an inferred isnotnull(pk_bucket) the aggregate
        # branch lacks, the canonicalized exchange subtrees differ, and
        # ReuseExchange cannot dedup the shuffle (two full scans).
        .filter(F.col("pk_key").isNotNull() & F.col("pk_bucket").isNotNull())
    )
    # Within-bucket exclusive cumsum FIRST; bucket totals are then derived
    # from the same shuffled output, so both branches hang off ONE
    # exchange (ReusedExchange) — the token-count projection (often a
    # regex over the full text) is scanned and shuffled exactly once.
    w_in = (
        Window.partitionBy("pk_key", "pk_bucket")
        .orderBy("pk_order")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    win = base.withColumn(
        "in_off", F.coalesce(F.sum("n_tok").over(w_in), F.lit(0))
    )
    # Bucket totals come from in_off (last row's in_off + n_tok), NOT
    # sum(n_tok): using the window's output keeps this branch's physical
    # subtree identical to `win`'s up through the exchange, so Catalyst
    # prunes neither and ReuseExchange dedups the shuffle — otherwise the
    # aggregate plans its own scan+shuffle and the (possibly expensive)
    # token-count projection runs twice. Co-partitioned on
    # (pk_key, pk_bucket), so the aggregate itself needs no exchange.
    bucket_sums = win.groupBy("pk_key", "pk_bucket").agg(
        F.max(F.col("in_off") + F.col("n_tok")).alias("b_tok")
    )
    w_bucket = (
        Window.partitionBy("pk_key")
        .orderBy("pk_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bucket_offsets = bucket_sums.select(
        "pk_key",
        "pk_bucket",
        F.coalesce(F.sum("b_tok").over(w_bucket), F.lit(0)).alias("b_off"),
    )
    # bucket_offsets has n_docs/bucket_width rows — broadcastable at
    # bucket_width ≈ sqrt(N); if it ever isn't, AQE falls back to a
    # shuffle join that reuses `win`'s (pk_key, pk_bucket) partitioning.
    return (
        win.join(bucket_offsets, ["pk_key", "pk_bucket"])
        # the zero-token drop, on the materialized column (see docstring)
        .filter(F.col("n_tok") > 0)
        .select(
            F.col("pk_key").alias(key_col),
            F.col("pk_order").alias(order_col),
            "n_tok",
            (F.col("b_off") + F.col("in_off")).alias("cum_before"),
        )
    )


def pack_sequences(
    docs: DataFrame,
    budget: int,
    ntok_col: str,
    key_col: str = "source",
    order_col: str = "doc_id",
    bucket_width: int = 1 << 20,
) -> DataFrame:
    """Concat-and-chunk packing: one output row per (document, pack)
    overlap with the document's token sub-range inside that pack.

    Output columns: ``key_col, order_col, n_tok, pack_id, tok_begin,
    tok_end`` — ``pack_id`` numbers each key's packs from 0, and
    ``[tok_begin, tok_end)`` is the document's range within the pack's
    ``budget``-token frame. Within a (key, pack) the ranges tile
    ``[0, budget)`` exactly; every pack except each key's last is full.
    Deterministic — no RNG, no partition-order dependence.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    offs = doc_token_offsets(
        docs, ntok_col, key_col=key_col, order_col=order_col,
        bucket_width=bucket_width,
    )
    b = int(budget)
    spanned = offs.withColumn(
        "pack_id",
        F.explode(
            F.sequence(
                F.expr(f"cum_before div {b}"),
                F.expr(f"(cum_before + n_tok - 1) div {b}"),
            )
        ),
    )
    return spanned.select(
        key_col,
        order_col,
        "n_tok",
        "pack_id",
        F.greatest(F.lit(0), F.col("cum_before") - F.col("pack_id") * b)
        .cast("bigint")
        .alias("tok_begin"),
        F.least(
            F.lit(b), F.col("cum_before") + F.col("n_tok") - F.col("pack_id") * b
        )
        .cast("bigint")
        .alias("tok_end"),
    )


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    stride: int | None = None,
    min_tokens: int = 1,
) -> DataFrame:
    """Split whitespace-tokenized documents into fixed-size token
    chunks with optional overlap — the per-document complement of
    ``pack_sequences`` (context-window preprocessing for long docs:
    chunk first, pack after). Output one row per chunk:
    ``(id, chunk_idx, chunk_text, n_tok)``.

    ``stride`` is the distance between chunk starts (defaults to
    ``chunk_tokens`` = disjoint chunks; smaller = overlapping sliding
    windows). Trailing chunks shorter than ``min_tokens`` are dropped
    (``min_tokens=1`` keeps every non-empty tail). Documents with no
    tokens yield no rows.

    All JVM expression work fused into the scan: tokenize once, chunk
    starts via ``sequence`` stepped by ``stride``, one ``slice`` +
    ``concat_ws`` per chunk, a single ``explode``. No UDF; the only
    data growth is the chunk_tokens/stride overlap factor, and no
    shuffle at all — chunking composes with downstream keyed ops
    without adding an exchange."""
    if chunk_tokens <= 0 or (stride is not None and stride <= 0):
        raise ValueError("chunk_tokens and stride must be positive")
    step = stride if stride is not None else chunk_tokens
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
        lambda t: t != F.lit(""),
    )

    def _chunks(a):
        # chunk starts 1, 1+step, ... <= n — guarded explicitly for the
        # empty-doc case: with ANSI off size(NULL) is -1 and
        # sequence(1, -1, step) throws (mixed-direction bounds), so the
        # NULL-propagation shortcut is NOT a safe guard (ANSI on only)
        starts = F.when(
            F.size(a) >= 1, F.sequence(F.lit(1), F.size(a), F.lit(step))
        ).otherwise(F.array().cast("array<int>"))
        return F.filter(
            F.transform(
                starts,
                lambda s: F.struct(
                    ((s - 1) / F.lit(step)).cast("bigint").alias("chunk_idx"),
                    F.concat_ws(" ", F.slice(a, s, chunk_tokens)).alias("chunk_text"),
                    F.least(
                        F.size(a) - s + 1, F.lit(chunk_tokens)
                    ).cast("bigint").alias("n_tok"),
                ),
            ),
            lambda c: c["n_tok"] >= min_tokens,
        )

    # bind the token array once (CollapseProject would re-tokenize per
    # chunk otherwise — same pathology documented in winnow_fingerprints)
    bound = F.element_at(F.transform(F.array(toks), _chunks), 1)
    return docs.select(
        F.col(id_col), F.explode(bound).alias("_c")
    ).select(id_col, "_c.chunk_idx", "_c.chunk_text", "_c.n_tok")
