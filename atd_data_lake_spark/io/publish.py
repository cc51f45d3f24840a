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
    """Upsert into the public layer on the content-hash key: new rows win
    (Socrata upsert semantics; Delta MERGE equivalent)."""
    tagged = existing.withColumn("_pri", F.lit(0)).unionByName(
        updates.withColumn("_pri", F.lit(1))
    )
    w = Window.partitionBy(key).orderBy(F.col("_pri").desc())
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_pri", "_rn")
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
