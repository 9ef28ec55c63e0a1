"""Parquet table loaders for the driver-provided test tables (TESTDATA.md).

At production scale these reads would be ``spark.read.format("iceberg")``
against a catalog table; the query code is identical either way — Catalyst
pushes filters/column pruning into both scans.  The sandbox has plain
parquet, which exercises the same pushdown machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names=TABLES) -> dict:
    return {n: load_table(spark, n, sf_dir) for n in names}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names=TABLES) -> None:
    for n in names:
        load_table(spark, n, sf_dir).createOrReplaceTempView(n)
