"""Structured Streaming drift: stateful scoring over micro-batches with
forest state carried in GroupState (availableNow trigger + memory sink)."""

from __future__ import annotations

import numpy as np
import pytest

from random_cut_forest_by_aws_spark.functions import token_features
from random_cut_forest_by_aws_spark.operators.drift import DriftConfig
from random_cut_forest_by_aws_spark.sources import sequences
from random_cut_forest_by_aws_spark.streaming import streaming_drift_scores


@pytest.mark.timeout(600)
def test_streaming_drift_scores(spark, tmp_path):
    src_dir = str(tmp_path / "stream_src")
    ckpt = str(tmp_path / "stream_ckpt")
    df = sequences(spark, 6000, seed=42, violations=False, drift=True)
    feat = df.withColumn("features", token_features()).select("source", "seq", "features")
    feat.write.mode("overwrite").parquet(src_dir)

    stream = (
        spark.readStream.schema(feat.schema).option("maxFilesPerTrigger", "2").parquet(src_dir)
    )
    cfg = DriftConfig(num_trees=10, sample_size=32, chunk_size=512, buckets=2)
    out = streaming_drift_scores(stream, cfg=cfg)
    q = (
        out.writeStream.format("memory")
        .queryName("drift_stream_out")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    res = spark.sql("SELECT * FROM drift_stream_out").toPandas()
    assert len(res) > 0
    assert {"source", "bucket", "seq", "score", "threshold", "grade"} <= set(res.columns)
    assert (res["score"] >= 0).all()
    # web rows should be scored once warm
    web = res[res["source"] == "web"]
    assert len(web) > 1000
    assert np.isfinite(web["score"]).all()


@pytest.mark.timeout(600)
def test_streaming_drift_subtract_ma_transform(spark, tmp_path):
    """Streaming supports the full TransformMethod set (parity with the
    batch operator): SUBTRACT_MA carries its discounted mean (and the
    difference transform's tlast) across micro-batches in GroupState."""
    src_dir = str(tmp_path / "s2_src")
    ckpt = str(tmp_path / "s2_ckpt")
    df = sequences(spark, 4000, seed=7, violations=False, drift=False)
    feat = df.withColumn("features", token_features()).select("source", "seq", "features")
    feat.write.mode("overwrite").parquet(src_dir)
    stream = (
        spark.readStream.schema(feat.schema).option("maxFilesPerTrigger", "2").parquet(src_dir)
    )
    cfg = DriftConfig(num_trees=10, sample_size=32, chunk_size=512, buckets=1,
                      transform="subtract_ma", norm_discount=0.02)
    out = streaming_drift_scores(stream, cfg=cfg)
    q = (
        out.writeStream.format("memory").queryName("drift_stream_sub")
        .option("checkpointLocation", ckpt).trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    res = spark.sql("SELECT * FROM drift_stream_sub").toPandas()
    assert len(res) > 1000
    assert np.isfinite(res["score"]).all()
    assert (res["score"] >= 0).all()
