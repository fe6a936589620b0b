"""Corpus-statistics language-model quality scoring (perplexity proxy).

Production pretraining filters score documents against a language model
of the corpus itself (CCNet-style): gibberish, boilerplate, and
wrong-language text score far below fluent prose. Without external LM
libraries the honest Spark-native version is an add-one-smoothed
unigram model ESTIMATED FROM THE CORPUS IN THE SAME JOB:

  pass 1  word frequencies  — explode + hash aggregate (map-side
          combined; the exploded rows never materialize past the
          partial agg), vocabulary = words with count >= min_count;
  pass 2  per-document mean log p(word), OOV words collapse to the
          smoothing floor: p(w) = (cnt(w) + 1) / (N + V + 1) with N =
          total corpus tokens and V = vocabulary size.

Scale shape: the frequency table is Zipf-bounded (vocabulary grows
~sub-linearly in corpus size), so the scoring join is broadcastable far
beyond the aggregate's input scale; N and V travel as a broadcast
1-row cross join, never through the driver. The per-doc re-aggregation
exchanges one row per (doc, partition) thanks to partial aggregation
over co-located exploded tokens. Everything is integer counts + one
ln() per distinct (word, doc) row — engine-portable, so the DuckDB gate
oracle replays the exact model.

Tokens are raw space-split words — deliberately NOT lowercased:
Unicode case mapping is a dialect divergence between engines, and the
model does not need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    round_dp: int = 4,
) -> DataFrame:
    """Per-document add-one-smoothed unigram mean log-probability.

    Output: ``id_col, n_tok, n_oov, logprob`` — ``n_oov`` counts tokens
    outside the min_count vocabulary, ``logprob`` is the mean
    ln p(word) (higher = more typical of the corpus), rounded to
    ``round_dp`` for cross-engine comparability. Documents whose text
    splits to zero words are absent from the output.
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    tok = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("word")
    )
    # Unfiltered frequency table FIRST: the vocabulary (HAVING), the
    # total token count N (sum of all counts) and the vocab size V all
    # derive from it, so the three consumers hang off ONE exchange
    # (ReuseExchange) and the model pass explodes the corpus once — not
    # three times. The explicit isnotnull(word) mirrors the null-
    # rejection the scoring join infers on its build side; without it
    # that branch's canonicalized subtree diverges and the reuse breaks
    # (split() elements are never null, so semantics are unchanged).
    freq_all = (
        tok.filter(F.col("word").isNotNull())
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    freq = freq_all.filter(F.col("cnt") >= min_count)
    # N counts ALL tokens (in- and out-of-vocabulary); V is vocab size.
    stats = freq_all.agg(F.sum("cnt").alias("n_total")).crossJoin(
        freq.agg(F.count(F.lit(1)).alias("v"))
    )
    scored = (
        tok.join(F.broadcast(freq), "word", "left")
        .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
        .crossJoin(F.broadcast(stats))
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tok"),
        F.sum((F.col("cnt") == 0).cast("bigint")).cast("bigint").alias("n_oov"),
        F.round(
            F.avg(
                F.log(
                    (F.col("cnt") + F.lit(1.0))
                    / (F.col("n_total") + F.col("v") + F.lit(1.0))
                )
            ),
            round_dp,
        ).alias("logprob"),
    )
