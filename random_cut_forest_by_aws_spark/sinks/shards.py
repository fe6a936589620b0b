"""Sharded training-dataset sink: pack assignments → size-bounded
parquet shards plus a manifest.

Dataloaders want the inverse of what a query engine wants: many
equal-sized files they can assign to workers without listing-time
statistics. This sink groups consecutive packs into shards of
``packs_per_shard`` (so every shard holds ≈ packs_per_shard × budget
tokens — uniform by construction, because pack_sequences fills every
pack except each key's last), writes ONE file per shard, and writes a
manifest table (per-shard doc/pack/token counts) the loader reads
instead of listing files.

One-file-per-shard shape: rows repartition by (key, shard_id) — hash
partitioning puts each shard's rows in exactly one task — and the
write partitions by the same columns, so each ``key=…/shard=…``
directory receives exactly one part file from exactly one task. The
manifest is a map-side-combined aggregate over the same rows. Shards
are deterministic: same input → byte-stable shard membership (file
bytes also identical when the caller fixes the shuffle partitioning,
since rows are sorted within each shard before writing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_packed_shards(
    packed: DataFrame,
    path: str,
    packs_per_shard: int = 1024,
    key_col: str = "source",
    id_col: str = "doc_id",
) -> None:
    """Write the output of ``operators.packing.pack_sequences`` as
    ``<path>/data/<key>=…/shard=…/part-*.parquet`` (one file per shard)
    plus ``<path>/manifest`` (one row per shard). ``id_col`` names the
    document column (pack_sequences keeps the caller's order_col name)."""
    if packs_per_shard <= 0:
        raise ValueError(f"packs_per_shard must be positive, got {packs_per_shard}")
    sharded = packed.withColumn(
        "shard", F.expr(f"pack_id div {int(packs_per_shard)}")
    )
    (
        sharded.repartition(key_col, "shard")
        .sortWithinPartitions(key_col, "shard", "pack_id", id_col)
        .write.mode("overwrite")
        .partitionBy(key_col, "shard")
        .parquet(f"{path}/data")
    )
    manifest = sharded.groupBy(key_col, "shard").agg(
        F.countDistinct("pack_id").cast("bigint").alias("n_packs"),
        F.countDistinct(id_col).cast("bigint").alias("n_docs"),
        F.sum(F.col("tok_end") - F.col("tok_begin")).alias("n_tokens"),
        F.min("pack_id").alias("first_pack"),
        F.max("pack_id").alias("last_pack"),
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(f"{path}/manifest")


def read_shard_manifest(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(f"{path}/manifest")
