"""S9/S12 — layered lakehouse writer.

The reference writes JSON documents to S3 buckets keyed
``year/month/day/datasource/filename`` (storage_s3.py:36-48,
support/storage.py:101-148).  Spark-first: each layer is a Parquet
(Delta, where available) table partitioned by (data_source,
collection_date) — the Hive-style layout gives partition pruning for
free (SURVEY §4), and a "file" becomes a partition slice.  The JSON
envelope's header fields land in a manifest table instead of per-file
headers (SURVEY §1.1.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LAYERS = ("raw", "standardized", "ready", "public")  # config_app.py:21-28


def write_layer(
    df: DataFrame,
    lake_root: str,
    layer: str,
    mode: str = "append",
    partition_cols: tuple[str, ...] = ("data_source", "collection_date"),
) -> None:
    """Partitioned write into one layer.  ``dynamic`` overwrite replaces
    only the partitions present in ``df`` — the engine's idempotent
    re-run/force semantics (a re-run of day D rewrites day D only)."""
    if layer.removesuffix("-test") not in LAYERS:  # --debug targets <layer>-test
        raise ValueError(f"unknown layer {layer!r}; expected one of {LAYERS}")
    writer = df.write.mode(mode)
    if mode == "overwrite":
        writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.partitionBy(*partition_cols).parquet(f"{lake_root}/{layer}")


def read_layer(
    spark: SparkSession, lake_root: str, layer: str, **partition_filters
) -> DataFrame:
    """Partition-pruned read (filters on partition columns never touch
    non-matching files — verify with .explain: PartitionFilters)."""
    df = spark.read.parquet(f"{lake_root}/{layer}")
    for k, v in partition_filters.items():
        df = df.filter(F.col(k) == v)
    return df


def manifest_row(df: DataFrame, **header) -> DataFrame:
    """S12's header → one manifest row per written slice: the JSON
    envelope's header fields (data_type, file_type, origin/target
    filename, collection/processing date — bt_json_standard.py:128-133)
    plus the slice's record count."""
    agg = df.agg(F.count("*").alias("records"))
    for k, v in header.items():
        agg = agg.withColumn(k, F.lit(v))
    return agg
