"""Bucketed-table writer — co-located joins without a shuffle.

The reference joins everything in pandas on one box; at 100 TB the
equivalent repeated joins (catalog ⋈ catalog for J1, fact ⋈ fact for
dedup pair-joins, day-over-day self-joins) each pay a full shuffle of
both sides.  Writing the hot join key bucketed moves that shuffle to
write time, once: two tables bucketed by the same key into the same
bucket count join with ZERO exchanges — each task reads matching bucket
files from both sides (`tests/test_bucketed.py` asserts the plan).

Bucketing is the right tool when a table is joined on the same key many
times (catalog by ``id_base``, signatures by doc id); for one-shot joins
AQE's runtime sizing is already optimal and bucketing just adds write
cost.  ``sortBy`` within buckets additionally removes the sort from
sort-merge joins and enables file-skipping on the sort key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally bucket-sorted) managed
    parquet table.  ``n_buckets`` should be sized so one bucket of the
    LARGER join side fits an executor core's working memory (buckets are
    the parallelism floor for bucket-joins — too few caps the cluster)."""
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket metadata (a plain
    ``spark.read.parquet`` on the files would LOSE the bucketing and
    reintroduce the shuffle)."""
    return spark.table(table)
