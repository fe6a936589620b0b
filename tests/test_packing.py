"""Sequence packing: pure-Python reference parity, tiling invariants,
and bucket-width independence of the hierarchical prefix sum."""

from __future__ import annotations

import pandas as pd
import pytest

from random_cut_forest_by_aws_spark.operators.packing import (
    doc_token_offsets,
    pack_sequences,
)

# (source, doc_id, n_tok): out-of-order ids, a zero-token doc, a doc
# spanning several budgets, and a second key.
DOCS = [
    ("web", 11, 7),
    ("web", 3, 5),
    ("web", 42, 0),
    ("web", 7, 23),  # spans multiple packs at budget 8
    ("web", 29, 1),
    ("books", 2, 8),  # exactly one full pack
    ("books", 9, 9),
    ("books", 100, 2),
]
BUDGET = 8


def _reference_pack(docs, budget):
    """Concat-and-chunk by hand: walk each key's docs in id order,
    tracking the global token cursor."""
    rows = []
    by_key = {}
    for key, did, n in docs:
        by_key.setdefault(key, []).append((did, n))
    for key, items in by_key.items():
        cursor = 0
        for did, n in sorted(items):
            if n <= 0:
                continue
            first, last = cursor // budget, (cursor + n - 1) // budget
            for p in range(first, last + 1):
                begin = max(0, cursor - p * budget)
                end = min(budget, cursor + n - p * budget)
                rows.append((key, did, n, p, begin, end))
            cursor += n
    return pd.DataFrame(
        rows,
        columns=["source", "doc_id", "n_tok", "pack_id", "tok_begin", "tok_end"],
    ).sort_values(["source", "doc_id", "pack_id"]).reset_index(drop=True)


def _spark_pack(spark, bucket_width):
    df = spark.createDataFrame(
        pd.DataFrame(DOCS, columns=["source", "doc_id", "n_tok"])
    )
    return (
        pack_sequences(
            df, BUDGET, "n_tok", bucket_width=bucket_width
        )
        .toPandas()
        .astype({"n_tok": "int64", "pack_id": "int64",
                 "tok_begin": "int64", "tok_end": "int64"})
        .sort_values(["source", "doc_id", "pack_id"])
        .reset_index(drop=True)
    )


def test_matches_reference(spark):
    got = _spark_pack(spark, bucket_width=1 << 20)
    exp = _reference_pack(DOCS, BUDGET)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@pytest.mark.parametrize("bucket_width", [1, 3, 16, 1 << 40])
def test_bucket_width_invariance(spark, bucket_width):
    """The hierarchical prefix sum must give identical offsets at any
    bucket granularity — including width 1 (every doc its own bucket)
    and a width larger than every id (one bucket per key)."""
    got = _spark_pack(spark, bucket_width=bucket_width)
    exp = _reference_pack(DOCS, BUDGET)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_tiling_invariants(spark):
    """Within each (key, pack) the doc ranges tile [0, budget) with no
    gaps or overlaps; every pack except each key's last is full."""
    got = _spark_pack(spark, bucket_width=4)
    for (key, pack), grp in got.groupby(["source", "pack_id"]):
        grp = grp.sort_values("tok_begin")
        assert grp["tok_begin"].iloc[0] == 0, (key, pack)
        ends = grp["tok_end"].to_numpy()
        begins = grp["tok_begin"].to_numpy()
        assert (begins[1:] == ends[:-1]).all(), (key, pack)
        last_pack = got.loc[got["source"] == key, "pack_id"].max()
        if pack < last_pack:
            assert ends[-1] == BUDGET, (key, pack)
    # total packed tokens == total input tokens (zero-token docs drop out)
    assert (got["tok_end"] - got["tok_begin"]).sum() == sum(
        n for _, _, n in DOCS
    )


def test_offsets_only(spark):
    """doc_token_offsets is the exclusive per-key prefix sum in id
    order, with zero-token docs removed."""
    df = spark.createDataFrame(
        pd.DataFrame(DOCS, columns=["source", "doc_id", "n_tok"])
    )
    got = (
        doc_token_offsets(df, "n_tok", bucket_width=3)
        .toPandas()
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    web = got[got["source"] == "web"]
    assert web["doc_id"].tolist() == [3, 7, 11, 29]
    assert web["cum_before"].tolist() == [0, 5, 28, 35]
    books = got[got["source"] == "books"]
    assert books["cum_before"].tolist() == [0, 8, 17]


def test_budget_validation(spark):
    df = spark.createDataFrame(
        pd.DataFrame(DOCS, columns=["source", "doc_id", "n_tok"])
    )
    with pytest.raises(ValueError):
        pack_sequences(df, 0, "n_tok")


# ----------------------------------------------------------------- chunking
def test_chunk_documents_scalar_replay(spark):
    """Chunking matches the scalar reference on mixed lengths, strides
    and degenerate docs; disjoint chunks reassemble the token stream."""
    from random_cut_forest_by_aws_spark.operators.packing import chunk_documents

    texts = ["", None, "a", " ".join(f"t{i}" for i in range(100)),
             " ".join(f"u{i}" for i in range(32)),
             " ".join(f"v{i}" for i in range(33)),
             "  double  spaced  words  "]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )

    def scalar(t, c, s):
        toks = [x for x in (t or "").split(" ") if x]
        return [
            ((st - 1) // s, " ".join(toks[st - 1 : st - 1 + c]),
             min(len(toks) - st + 1, c))
            for st in range(1, len(toks) + 1, s)
        ]

    for c, s in [(32, 16), (32, 32), (10, 3)]:
        got = chunk_documents(df, chunk_tokens=c, stride=s).toPandas()
        by_doc = {
            i: sorted(
                zip(g["chunk_idx"], g["chunk_text"], g["n_tok"]),
            )
            for i, g in got.groupby("doc_id")
        }
        for i, t in enumerate(texts):
            exp = sorted(scalar(t, c, s))
            assert by_doc.get(i, []) == exp, (c, s, i)
    # disjoint chunks (stride == chunk) reassemble the token stream
    dis = chunk_documents(df, chunk_tokens=7, stride=7).toPandas()
    g3 = dis[dis.doc_id == 3].sort_values("chunk_idx")
    assert " ".join(g3["chunk_text"]) == texts[3]
    assert g3["n_tok"].sum() == 100


def test_chunk_documents_param_validation(spark):
    from random_cut_forest_by_aws_spark.operators.packing import chunk_documents

    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, stride=0)
    # min_tokens drops short tails: 5 tokens, chunks of 4, stride 4 ->
    # tail of 1 dropped at min_tokens=2
    df5 = spark.createDataFrame([(0, "a b c d e")], "doc_id long, text string")
    got = chunk_documents(df5, chunk_tokens=4, stride=4, min_tokens=2).toPandas()
    assert len(got) == 1 and got.iloc[0]["n_tok"] == 4


def test_chunk_documents_empty_doc_ansi_off(spark):
    """Empty/NULL docs must not crash with ANSI off: size(NULL) is -1
    there, so the guard must be an explicit when(), not NULL
    propagation into sequence()."""
    from random_cut_forest_by_aws_spark.operators.packing import chunk_documents

    df = spark.createDataFrame(
        [(0, ""), (1, None), (2, "a b c")], "doc_id long, text string"
    )
    prev = spark.conf.get("spark.sql.ansi.enabled", None)
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        got = chunk_documents(df, chunk_tokens=2, stride=2).toPandas()
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.ansi.enabled", prev)
    assert sorted(got["doc_id"].unique()) == [2]
    assert len(got) == 2
