"""S13/S14 — publisher sinks.

S13 Socrata: the reference buffers rows and flushes 10,000-row chunks,
upserting on the md5 ``record_id`` (support/publish.py:8-91,
drivers/publish_socrata.py:10-54) — content-hash keys make re-publish
idempotent (docs/reprocessing.md:5-17).  Spark-first: the ``public``
layer is a table MERGEd on record_id; the optional REST push runs
``foreachPartition`` with the same chunk size, so executors publish in
parallel and nothing funnels through the driver.

S14 CSV: header from the first row, 1,000-row chunks
(support/publish.py:120-162) → a plain header'd CSV write; the chunking
constant survives as the writer's file-size hint.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SOC_CHUNK = 10_000  # drivers/publish_socrata.py:10
CSV_CHUNK = 1_000  # support/publish.py:151-155


def merge_public(existing: DataFrame, updates: DataFrame, key: str = "record_id") -> DataFrame:
    """Upsert on the content-hash key: new rows win (Socrata upsert
    semantics; Delta MERGE equivalent).  Pure transform over whatever
    ``existing`` holds — at scale, hand it the PRUNED slice of the public
    layer (see ``merge_public_layer``), not the whole table."""
    tagged = existing.withColumn("_pri", F.lit(0)).unionByName(
        updates.withColumn("_pri", F.lit(1))
    )
    w = Window.partitionBy(key).orderBy(F.col("_pri").desc())
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_pri", "_rn")
    )


def merge_public_layer(
    spark,
    public_path: str,
    updates: DataFrame,
    key: str = "record_id",
    partition_cols: tuple[str, ...] = ("data_source", "collection_date"),
) -> None:
    """Partition-scoped batch upsert into the public layer: only the
    partitions TOUCHED by ``updates`` are read, merged, and rewritten.

    An un-scoped union+window upsert rewrites the whole table on every
    publish — O(table) write amplification on an unboundedly-growing
    layer.  This path is O(touched partitions):

    1. the distinct partition tuples in ``updates`` are collected (a
       publish batch touches a handful of days — driver-small by
       construction, never row data);
    2. the existing layer is read with a static partition-value filter,
       so the scan prunes to exactly those directories;
    3. ``merge_public`` resolves the upsert within the touched slice;
    4. dynamic partition overwrite replaces only the partitions present
       in the merged frame — untouched partitions' files are never
       rewritten (asserted by test).

    First publish (no existing layer) degrades to a plain partitioned
    write of the deduped updates.
    """
    from functools import reduce
    from operator import and_, or_
    from pyspark.errors import AnalysisException

    try:
        existing = spark.read.parquet(public_path)
        have_existing = True
    except AnalysisException:
        have_existing = False

    if have_existing:
        touched = updates.select(*partition_cols).distinct().collect()
        cond = reduce(
            or_,
            [
                reduce(and_, [F.col(c) == r[c] for c in partition_cols])
                for r in touched
            ],
        )
        # materialize the merged slice before writing: Spark (rightly)
        # refuses to overwrite a path its own plan is still reading.  The
        # slice is bounded by the touched partitions, so the checkpoint is
        # small; on a cluster use reliable checkpoint or Delta MERGE.
        merged = merge_public(existing.filter(cond), updates, key).localCheckpoint(
            eager=True
        )
    else:
        # still dedupe within the batch: latest-wins is arbitrary among
        # equal keys, matching merge_public's update-side semantics
        merged = merge_public(updates.limit(0), updates, key)

    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(public_path)
    )


def merge_public_txlog(
    spark,
    table_path: str,
    updates: DataFrame,
    key: str = "record_id",
    commit_id: str | None = None,
):
    """Exactly-once publish MERGE — the public layer committed through
    the native transaction log (r7: the same guarantees the catalog's
    ``upsert_table`` gained in r6 — snapshot isolation, optimistic
    concurrency, idempotent ``commit_id`` replay, copy-on-write file
    pruning, time travel).

    ``updates`` dedupes to one row per ``key`` first (latest-wins is
    arbitrary among equal in-batch keys — ``merge_public``'s documented
    update-side semantics).  A re-delivered publish batch with the same
    ``commit_id`` is a no-op replay; two concurrent publishers racing
    the same base version: one wins, the other gets ``CommitConflict``
    and must re-derive.  Read with ``txlog.read_table``.

    The dynamic-partition-overwrite path (``merge_public_layer``) stays
    as the directory-layout alternative where readers need plain
    partition-pruned parquet; this path is the one with transactional
    semantics.  Returns the ``txlog.CommitResult``."""
    from atd_data_lake_spark.io import txlog

    updates = updates.dropDuplicates([key])
    return txlog.merge(
        spark, table_path, updates, on=[key], commit_id=commit_id
    )


def push_rest(
    df: DataFrame,
    send: Callable[[list[dict]], None],
    chunk_size: int = SOC_CHUNK,
) -> None:
    """Optional REST push: per-partition chunked delivery (the process
    boundary of S13).  ``send`` receives ≤ chunk_size row-dicts; inject a
    requests-based callable in production, a recorder in tests."""

    def _part(rows: Iterator) -> None:
        buf: list[dict] = []
        for r in rows:
            buf.append(r.asDict())
            if len(buf) >= chunk_size:
                send(buf)
                buf = []
        if buf:
            send(buf)

    df.foreachPartition(_part)


def publish_stream(
    stream_df: DataFrame,
    public_path: str,
    checkpoint: str,
    send: Callable[[list[dict]], None] | None = None,
    chunk_size: int = SOC_CHUNK,
):
    """S13 as a streaming sink — merge-on-read upsert over plain parquet.

    Each micro-batch APPENDS with a monotonically increasing ``_pub_seq``
    (the batch id): appends are atomic and cheap, and ``read_public``
    resolves the latest version of each record_id at read time (the
    Hudi/Iceberg merge-on-read pattern; with Delta available this
    becomes a real MERGE).  Re-delivered batches (checkpoint replay)
    rewrite the same records and the read view is unchanged —
    exactly-once publish semantics from at-least-once delivery, same as
    the reference's content-hash upsert (docs/reprocessing.md:5-17).
    ``send``: optional chunked REST push per batch (S13's process
    boundary).  Returns the started StreamingQuery.
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("_pub_seq", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(public_path)
        if send is not None:
            push_rest(batch_df, send, chunk_size)

    return (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_public(spark, public_path: str, key: str = "record_id") -> DataFrame:
    """Read view over a ``publish_stream`` layer: latest version per
    record (max_by on the append sequence — one shuffle on the key)."""
    from atd_data_lake_spark.operators.windows import latest_per_group

    df = spark.read.parquet(public_path)
    return latest_per_group(df, [key], "_pub_seq").drop("_pub_seq")


def compact_public(spark, public_path: str, key: str = "record_id") -> DataFrame:
    """Compaction job for the merge-on-read layer: returns the resolved
    frame for the runner to rewrite (write_layer) once the append count
    warrants it — read cost returns to one row per record."""
    return read_public(spark, public_path, key)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S14: header'd CSV output (header from the schema rather than the
    first row — same wire format, deterministic)."""
    df.write.mode(mode).option("header", "true").csv(path)
