"""Unigram LM quality score: hand-computed model parity, OOV behavior,
and the signal property (gibberish scores below fluent repetition)."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from random_cut_forest_by_aws_spark.operators.lm_quality import unigram_logprob

DOCS = [
    ("d1", "the cat sat on the mat"),
    ("d2", "the dog sat on the rug"),
    ("d3", "the the the the"),
    ("d4", "zxqv wmblr pfft"),  # gibberish: every token OOV
    ("d5", ""),
]


def _reference(docs, min_count):
    toks = [(d, w) for d, t in docs for w in t.split(" ")]
    from collections import Counter

    cnt = Counter(w for _, w in toks)
    vocab = {w: c for w, c in cnt.items() if c >= min_count}
    n_total, v = len(toks), len(vocab)
    rows = {}
    for d, t in docs:
        words = t.split(" ")
        lps = [
            math.log((vocab.get(w, 0) + 1.0) / (n_total + v + 1.0))
            for w in words
        ]
        rows[d] = (
            len(words),
            sum(1 for w in words if w not in vocab),
            round(sum(lps) / len(lps), 4),
        )
    return rows


@pytest.mark.parametrize("min_count", [1, 2, 3])
def test_matches_hand_model(spark, min_count):
    df = spark.createDataFrame(pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    got = (
        unigram_logprob(df, min_count=min_count)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    exp = _reference(DOCS, min_count)
    assert set(got.index) == set(exp)  # "" splits to [""], a real token
    for d, (n_tok, n_oov, lp) in exp.items():
        assert got.loc[d, "n_tok"] == n_tok, d
        assert got.loc[d, "n_oov"] == n_oov, d
        assert got.loc[d, "logprob"] == pytest.approx(lp, abs=1e-9), d


def test_gibberish_scores_lowest(spark):
    df = spark.createDataFrame(pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    got = unigram_logprob(df, min_count=2).toPandas().set_index("doc_id")
    # all-OOV gibberish ranks below every in-vocabulary document
    assert got.loc["d4", "logprob"] < got.loc["d1", "logprob"]
    assert got.loc["d4", "logprob"] < got.loc["d2", "logprob"]
    assert got.loc["d4", "logprob"] < got.loc["d3", "logprob"]
    assert got.loc["d4", "n_oov"] == 3


def test_min_count_validation(spark):
    df = spark.createDataFrame(pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    with pytest.raises(ValueError):
        unigram_logprob(df, min_count=0)
