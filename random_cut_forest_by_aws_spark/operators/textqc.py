"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting. All JVM-side built-ins (split / filter /
aggregate / regexp) — these run as narrow map stages fused into the scan,
which is what makes them viable at 10^12 documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "nicht"],
    "fr": ["le", "la", "et", "de", "un", "une", "est", "que", "pour", "dans"],
}


def word_stats(text_col: str = "text") -> list[Column]:
    """n_words, n_chars, avg_word_len — exact integer/ratio arithmetic."""
    words = F.split(F.col(text_col), " ")
    n_words = F.size(words)
    n_chars = F.length(F.col(text_col))
    avg_word_len = (
        (n_chars - (n_words - 1)).cast("double") / F.greatest(n_words, F.lit(1)).cast("double")
    )
    return [
        n_words.cast("bigint").alias("n_words"),
        n_chars.cast("bigint").alias("n_chars_eng"),
        avg_word_len.alias("avg_word_len"),
    ]


def stopword_frac(text_col: str = "text", lang: str = "en") -> Column:
    words = F.split(F.col(text_col), " ")
    stop = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(words, lambda w: F.array_contains(stop, F.lower(w))))
    return hits.cast("double") / F.greatest(F.size(words), F.lit(1)).cast("double")


def quality_score(text_col: str = "text") -> Column:
    """Heuristic [0,1] quality: length band + stopword presence + word-length
    sanity (the usual pretraining-filter trio, cheap and monotone)."""
    words = F.split(F.col(text_col), " ")
    n_words = F.size(words).cast("double")
    len_ok = F.when((n_words >= 5) & (n_words <= 5000), F.lit(1.0)).otherwise(F.lit(0.0))
    awl = (F.length(F.col(text_col)) - (F.size(words) - 1)).cast("double") / F.greatest(
        F.size(words), F.lit(1)
    ).cast("double")
    awl_ok = F.when((awl >= 2.0) & (awl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    sw = stopword_frac(text_col, "en")
    sw_ok = F.when(sw >= 0.02, F.lit(1.0)).otherwise(F.lit(0.0))
    return (len_ok + awl_ok + sw_ok) / F.lit(3.0)


def lang_id(text_col: str = "text") -> Column:
    """Argmax stopword-overlap language guess ('und' if no evidence)."""
    scores = [(lang, stopword_frac(text_col, lang)) for lang in STOPWORDS]
    best_lang: Column = F.lit("und")
    best_score: Column = F.lit(0.0)
    for lang, s in scores:
        improve = s > best_score
        best_lang = F.when(improve, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(improve, s).otherwise(best_score)
    return best_lang


BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def token_counts(text_col: str = "text") -> list[Column]:
    """Whitespace token count + BPE-ish regex token count (letters runs /
    digit runs / single punctuation — the usual subword-ish upper bound)."""
    ws = F.size(F.split(F.col(text_col), " ")).cast("bigint").alias("n_ws_tokens")
    bpe = F.regexp_count(F.col(text_col), F.lit(BPE_ISH_PATTERN)).cast("bigint").alias(
        "n_bpe_tokens"
    )
    return [ws, bpe]


def doc_fingerprint(text_col: str = "text", seed: int = 42) -> Column:
    """Order-sensitive rolling hash over words — deterministic 64-bit
    content fingerprint. Chains ``xxhash64(acc, word)`` instead of doing
    polynomial arithmetic so it is ANSI-safe (no long overflow)."""
    words = F.split(F.col(text_col), " ")
    return F.aggregate(
        words,
        F.lit(seed).cast("long"),
        lambda acc, w: F.xxhash64(acc, w),
    )


def _word_ngrams(words: Column, n: int) -> Column:
    """Space-joined word n-grams as an array<string> (empty when the doc
    has fewer than n words). Pure JVM expressions; ANSI-safe — the
    index sequence is guarded so element_at never sees an out-of-bounds
    index, and sequence() never sees start > stop (which would silently
    produce a DESCENDING range)."""
    size = F.size(words)
    idx = F.sequence(F.lit(1), size - F.lit(n - 1))  # 1-based start positions
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, i + F.lit(j)) for j in range(n)]
        ),
    )
    return F.when(size >= F.lit(n), grams).otherwise(
        F.array().cast("array<string>")
    )


def repetition_profile(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1):
    the fraction of duplicate words / 2-grams / 3-grams per document.
    Machine-generated and boilerplate text shows high duplicate-n-gram
    fractions; the usual pretraining filter drops docs above ~0.2 dup
    2-grams. All JVM built-ins fused into the scan — no shuffle, no
    Python — so it composes with the other text filters in one stage at
    10^12 documents."""
    words = F.split(F.col(text_col), " ")

    def dup_frac(arr: Column) -> Column:
        n = F.size(arr)
        return F.when(
            n > 0,
            (n - F.size(F.array_distinct(arr))).cast("double") / n.cast("double"),
        ).otherwise(F.lit(0.0))

    return df.select(
        F.col(id_col),
        dup_frac(words).alias("dup_word_frac"),
        dup_frac(_word_ngrams(words, 2)).alias("dup_2gram_frac"),
        dup_frac(_word_ngrams(words, 3)).alias("dup_3gram_frac"),
    )


def text_profile(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One-pass per-document text profile."""
    return df.select(
        F.col(id_col),
        *word_stats(text_col),
        stopword_frac(text_col).alias("stopword_frac"),
        quality_score(text_col).alias("quality"),
        lang_id(text_col).alias("lang_guess"),
        doc_fingerprint(text_col).alias("fingerprint"),
    )


def tfidf_keywords(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 5,
    min_df: int = 1,
) -> DataFrame:
    """Top-``top_k`` keywords per document by tf-idf: one row per
    (doc, keyword) with ``tf`` (term count in the doc), ``df_count``
    (documents containing the term), ``rank`` (1 = top keyword) and
    ``score`` = tf · ln(N/df), the classic log-idf weight, rounded to
    6 dp.

    Determinism note: the RANKING key is the raw-idf ratio
    ``tf / df`` (equivalently tf·N/df — N is constant per corpus), not
    the log score. IEEE double division of exact integers is
    correctly-rounded and therefore IDENTICAL in every engine, so the
    keyword selection and rank order replay exactly (gate
    ``tfidf_keywords_docs``); ``ln`` is only guaranteed faithful to
    ~1 ulp per libm, which is fine for a displayed score but not for an
    ordering the oracle must reproduce bit-for-bit. Ties (equal tf and
    df) break lexicographically by term.

    Plan shape: explode → (doc, term) counts (one exchange, map-side
    combine), document frequencies derived FROM that aggregate (second
    exchange over the vocabulary — rows = distinct terms), broadcastable
    df join back, and the per-doc top-k window partitions by doc (its
    size is bounded by the doc's distinct-term count, never the
    corpus). N is the total input document count."""
    from pyspark.sql import Window as W

    n_docs = df.count()
    pairs = df.select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
                lambda t: t != F.lit(""),
            )
        ).alias("term"),
    )
    tf = pairs.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    # count(when(tf >= 1, 1)) == count(1) here (counts are always >= 1)
    # but CONSUMES the tf column through a predicate Catalyst cannot
    # fold away (a bare count("tf") is rewritten to count(1) via
    # non-null inference and then column-pruned): without the
    # dependency, this branch's upstream collapses to a distinct-style
    # aggregate, de-canonicalizing the shared (doc, term) exchange and
    # planning a SECOND corpus scan (CLAUDE.md Catalyst gotcha 2;
    # pinned by test_tfidf_single_scan_floor)
    dfreq = tf.groupBy("term").agg(
        F.count(F.when(F.col("tf") >= 1, F.lit(1))).alias("df_count")
    )
    scored = tf.join(dfreq, "term").filter(F.col("df_count") >= min_df)
    w = W.partitionBy(id_col).orderBy(
        (F.col("tf").cast("double") / F.col("df_count")).desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            F.col(id_col),
            "term",
            "tf",
            "df_count",
            F.col("rank").cast("bigint").alias("rank"),
            F.round(
                F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df_count")), 6
            ).alias("score"),
        )
    )
