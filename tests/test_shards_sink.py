"""Sharded dataset sink: round-trip fidelity, one file per shard,
manifest consistency with the data."""

from __future__ import annotations

import glob

import pandas as pd
import pytest

from random_cut_forest_by_aws_spark.operators.packing import pack_sequences
from random_cut_forest_by_aws_spark.sinks import (
    read_shard_manifest,
    write_packed_shards,
)


@pytest.fixture()
def packed(spark):
    rows = [
        ("web", i, 5 + (i * 7) % 11) for i in range(200)
    ] + [("books", 1000 + i, 3 + (i * 5) % 9) for i in range(60)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["source", "doc_id", "n_tok"])
    )
    return pack_sequences(df, 64, "n_tok", bucket_width=32)


def test_roundtrip_and_manifest(spark, packed, tmp_path):
    out = str(tmp_path / "shards")
    write_packed_shards(packed, out, packs_per_shard=4)

    back = spark.read.parquet(f"{out}/data")
    orig = packed.toPandas().sort_values(
        ["source", "doc_id", "pack_id"]).reset_index(drop=True)
    got = back.drop("shard").toPandas()[orig.columns].sort_values(
        ["source", "doc_id", "pack_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype(orig.dtypes.to_dict()), orig, check_dtype=False
    )

    # one parquet file per shard directory
    for shard_dir in glob.glob(f"{out}/data/source=*/shard=*"):
        parts = glob.glob(f"{shard_dir}/*.parquet")
        assert len(parts) == 1, shard_dir

    man = read_shard_manifest(spark, out).toPandas()
    # manifest totals == data totals
    assert man["n_tokens"].sum() == (orig["tok_end"] - orig["tok_begin"]).sum()
    assert man["n_packs"].sum() == len(
        orig[["source", "pack_id"]].drop_duplicates())
    # every shard holds at most packs_per_shard consecutive packs
    assert (man["last_pack"] - man["first_pack"] < 4).all()
    assert (man["n_packs"] <= 4).all()
    # shards are uniformly full except each key's last
    for key, grp in man.groupby("source"):
        full = grp[grp["shard"] < grp["shard"].max()]
        assert (full["n_packs"] == 4).all(), key


def test_validation(spark, packed, tmp_path):
    with pytest.raises(ValueError):
        write_packed_shards(packed, str(tmp_path / "x"), packs_per_shard=0)
