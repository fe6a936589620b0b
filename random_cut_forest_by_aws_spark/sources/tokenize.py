"""Derive the engine's tokenized-sequence table from a raw documents table.

A deterministic hash tokenizer, entirely JVM-side: whitespace split →
xxhash64 per word → vocab bucket. Turns any text corpus into the
``(doc_id, tokens, n_tok, source)`` shape the validation engine consumes
(BASELINE.json input_hint) with one narrow projection — no shuffle, no
Python. At 10^12 rows this is a pure map stage fused into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_VOCAB = 50_000


def tokenized_documents(
    docs: DataFrame,
    vocab: int = DEFAULT_VOCAB,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """documents(doc_id, text, source, …) → sequences(doc_id, tokens,
    n_tok, source, seq)."""
    words = F.split(F.col(text_col), " ")
    tokens = F.transform(words, lambda w: F.pmod(F.xxhash64(w), F.lit(vocab)).cast("int"))
    return docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        tokens.alias("tokens"),
        F.size(words).cast("int").alias("n_tok"),
        F.col(source_col).alias("source"),
        F.col(id_col).cast("long").alias("seq"),
    )
