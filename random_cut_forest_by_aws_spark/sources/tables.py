"""Loaders for the driver-generated parquet test tables (TESTDATA.md).

On a production cluster these would be ``spark.read.format("iceberg")``
catalog loads; parquet paths are the sandbox stand-in. Reads stay lazy so
Catalyst can push filters/column pruning into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
