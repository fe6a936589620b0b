"""ANN operators: exact cosine top-k vs LSH and IVF approximations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from random_cut_forest_by_aws_spark.operators.similarity import (
    cosine_topk,
    ivf_cosine_topk,
    lsh_cosine_topk,
)


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def qset(emb):
    return emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def _recall(exact, approx, k=10):
    e = exact.groupby("query_id")["vec_id"].apply(set)
    a = approx.groupby("query_id")["vec_id"].apply(set)
    scores = [len(e[q] & a.get(q, set())) / k for q in e.index]
    return sum(scores) / len(scores)


def test_exact_topk_self_hit(emb, qset):
    exact = cosine_topk(emb, qset, k=10).toPandas()
    top1 = exact[exact["rank"] == 1]
    assert (top1["query_id"] == top1["vec_id"]).all()  # self is nearest
    assert (top1["cosine"] > 0.999999).all()


def test_ivf_recall(emb, qset):
    exact = cosine_topk(emb, qset, k=10).toPandas()
    approx = ivf_cosine_topk(emb, qset, dim=64, k=10, n_lists=8, n_probe=4).toPandas()
    assert _recall(exact, approx) >= 0.6
    # full probe == exact
    full = ivf_cosine_topk(emb, qset, dim=64, k=10, n_lists=8, n_probe=8).toPandas()
    assert _recall(exact, full) == 1.0


def test_lsh_returns_ranked_buckets(emb, qset):
    approx = lsh_cosine_topk(emb, qset, dim=64, k=10, bits=6).toPandas()
    assert (approx.groupby("query_id")["rank"].min() == 1).all()
    assert approx["rank"].max() <= 10
