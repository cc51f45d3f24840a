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
    cluster_by: tuple[str, ...] = (),
    cluster_files: int | None = None,
) -> None:
    """Partitioned write into one layer.  ``dynamic`` overwrite replaces
    only the partitions present in ``df`` — the engine's idempotent
    re-run/force semantics (a re-run of day D rewrites day D only).

    ``cluster_by`` range-partitions on (partition_cols, cluster_by) and
    sorts within each task before writing — the OPTIMIZE-ZORDER-lite
    layout: every file inside a day partition covers a disjoint, sorted
    range of the cluster key, so readers filtering on it (timestamp
    ranges inside a day) skip whole files/row groups via parquet min/max
    stats.  Costs one range shuffle at write time; reads repay it on
    every range query.  ``cluster_files`` pins the range-partition count
    (file count per write); default lets AQE size it from the data.
    """
    if layer.removesuffix("-test") not in LAYERS:  # --debug targets <layer>-test
        raise ValueError(f"unknown layer {layer!r}; expected one of {LAYERS}")
    if cluster_by:
        keys = [*partition_cols, *cluster_by]
        if cluster_files:
            df = df.repartitionByRange(cluster_files, *keys)
        else:
            df = df.repartitionByRange(*keys)
        df = df.sortWithinPartitions(*keys)
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


def plan_compaction(
    spark: SparkSession,
    lake_root: str,
    layer: str,
    target_file_bytes: int = 128 << 20,
    min_files: int = 2,
) -> list[dict]:
    """Small-file audit: walk the layer's partition directories (Hadoop
    FileSystem API, so HDFS/S3A work the same as local) and return one
    entry per partition that holds more files than its bytes warrant:
    ``{partition, n_files, bytes, target_files}``.

    Streaming appends and per-day incremental runs accrete small files;
    at 100 TB each scan task then pays open/footer costs per file and
    the NameNode/listing pays per object.  The plan is driver-side
    metadata only — no Spark job runs.
    """
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(f"{lake_root}/{layer}")
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(root):
        return []
    plans: list[dict] = []

    def walk(path, rel):
        entries = fs.listStatus(path)
        files = [
            e for e in entries
            if e.isFile() and e.getPath().getName().endswith(".parquet")
        ]
        dirs = [e for e in entries if e.isDirectory()]
        if files:
            total = sum(e.getLen() for e in files)
            target = max(1, -(-total // target_file_bytes))
            if len(files) > max(target, min_files - 1):
                plans.append(
                    {
                        "partition": rel,
                        "n_files": len(files),
                        "bytes": total,
                        "target_files": int(target),
                    }
                )
        for d in dirs:
            walk(d.getPath(), f"{rel}/{d.getPath().getName()}" if rel else d.getPath().getName())

    walk(root, "")
    return sorted(plans, key=lambda p: p["partition"])


def compact_partitions(
    spark: SparkSession,
    lake_root: str,
    layer: str,
    target_file_bytes: int = 128 << 20,
    min_files: int = 2,
) -> list[dict]:
    """Execute ``plan_compaction``: rewrite each over-fragmented
    partition into ``target_files`` parquet files via a partition-pruned
    read + coalesce + dynamic-partition overwrite.

    Untouched partitions' files are never opened or rewritten (the read
    prunes to one partition; dynamic overwrite replaces only partitions
    present in the written frame).  The per-partition loop is driver-side
    orchestration over the *audit list* (typically the most recent days),
    not over the lake — each iteration launches one narrow job whose
    input is a single partition's bytes.  Returns the executed plan.
    """
    plans = plan_compaction(
        spark, lake_root, layer, target_file_bytes, min_files
    )
    for p in plans:
        # partition dir like "data_source=bt/collection_date=2019-06-03"
        df = spark.read.parquet(f"{lake_root}/{layer}")
        part_cols = []
        for piece in p["partition"].split("/"):
            k, v = piece.split("=", 1)
            df = df.filter(F.col(k) == v)
            part_cols.append(k)
        (
            df.coalesce(p["target_files"])
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*part_cols)
            .parquet(f"{lake_root}/{layer}")
        )
    return plans


def manifest_row(df: DataFrame, **header) -> DataFrame:
    """S12's header → one manifest row per written slice: the JSON
    envelope's header fields (data_type, file_type, origin/target
    filename, collection/processing date — bt_json_standard.py:128-133)
    plus the slice's record count."""
    agg = df.agg(F.count("*").alias("records"))
    for k, v in header.items():
        agg = agg.withColumn(k, F.lit(v))
    return agg


def delete_keys(
    spark: SparkSession,
    layer_path: str,
    keys: DataFrame,
    key: str = "record_id",
    partition_cols: tuple[str, ...] = ("data_source", "collection_date"),
) -> dict:
    """Targeted deletion (right-to-be-forgotten / bad-batch retraction):
    remove every row whose ``key`` appears in ``keys``, rewriting ONLY
    the partitions that actually hold such rows.

    Deletion requests arrive as keys, not partitions, so one
    pruned-COLUMN scan (key + partition columns — never the payload)
    locates the touched partitions first; the rewrite then

    1. reads just those partitions (static partition-value filter →
       directory pruning),
    2. drops the condemned rows with a broadcast anti-join,
    3. dynamic-partition-overwrites the survivors, and
    4. removes the directory of any partition left EMPTY — dynamic
       overwrite only replaces partitions present in the written frame,
       so a fully-deleted partition would otherwise keep its old files
       (on an object store / Delta this step is the DELETE commit).

    Untouched partitions' files are never opened or rewritten
    (test-enforced byte-identical).  Returns counts for audit logging —
    deletion is the one lake operation that must leave a trail.
    """
    import shutil
    from functools import reduce
    from operator import and_, or_

    k = keys.select(key).distinct()
    existing = spark.read.parquet(layer_path)
    touched = (
        existing.select(key, *partition_cols)
        .join(F.broadcast(k), key, "leftsemi")
        .select(*partition_cols)
        .distinct()
        .collect()
    )
    if not touched:
        return {"touched_partitions": 0, "deleted_rows": 0}

    cond = reduce(
        or_,
        [
            reduce(and_, [F.col(c) == r[c] for c in partition_cols])
            for r in touched
        ],
    )
    slice_df = spark.read.parquet(layer_path).filter(cond)
    n_before = slice_df.count()
    remain = slice_df.join(F.broadcast(k), key, "left_anti").persist()
    n_after = remain.count()

    kept_parts = {
        tuple(r[c] for c in partition_cols)
        for r in remain.select(*partition_cols).distinct().collect()
    }
    if n_after:
        (
            remain.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_cols)
            .parquet(layer_path)
        )
    remain.unpersist()
    # partitions whose every row was condemned: no output partition was
    # written, so drop their directories explicitly
    for r in touched:
        if tuple(r[c] for c in partition_cols) not in kept_parts:
            part_dir = "/".join(
                f"{c}={r[c]}" for c in partition_cols
            )
            shutil.rmtree(f"{layer_path}/{part_dir}", ignore_errors=True)
    return {
        "touched_partitions": len(touched),
        "deleted_rows": n_before - n_after,
    }
