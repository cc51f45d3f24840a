"""S1 — dated-filename directory scan (util/date_dirs.py:33-170).

The reference lists files matching ``prefix + strftime(date) + postfix``,
dedupes per date, sorts.  Spark-first: one ``binaryFile`` (or listing)
scan → DataFrame(path, kind, file_date) with the date parsed from the
filename by ``to_date(regexp_extract(...))`` — Catalyst prunes on the
resulting column, and downstream incremental planning (J1) joins against
the catalog instead of iterating a driver-side list.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class DatePattern:
    """One filename convention, e.g. Austin_bt_%m-%d-%Y.txt
    (bt_insert_lake.py:19-27)."""

    kind: str
    prefix: str
    postfix: str
    date_regex: str = r"(\d{2}-\d{2}-\d{4})"
    date_format: str = "MM-dd-yyyy"  # Spark to_date format of date_regex


def scan_dated_files(
    spark: SparkSession, path: str, patterns: list[DatePattern]
) -> DataFrame:
    """Directory → DataFrame(path, kind, file_date), one row per matching
    file, deduped per (kind, date) keeping the lexicographically first
    path (the reference keeps the first listing hit,
    util/date_dirs.py:96-110), sorted ascending like its compare loop."""
    listing = spark.read.format("binaryFile").option("pathGlobFilter", "*").load(
        path
    ).select(F.col("path"), F.col("length"))
    frames = []
    for p in patterns:
        esc_pre, esc_post = re.escape(p.prefix), re.escape(p.postfix)
        rx = f".*/{esc_pre}{p.date_regex}{esc_post}$"
        matched = listing.filter(F.col("path").rlike(rx)).select(
            "path",
            F.lit(p.kind).alias("kind"),
            F.to_date(F.regexp_extract("path", rx, 1), p.date_format).alias(
                "file_date"
            ),
        )
        frames.append(matched)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    w = Window.partitionBy("kind", "file_date").orderBy("path")
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .orderBy("file_date", "kind")
    )
