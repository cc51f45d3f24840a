"""Skew-handling joins (SCALE.md: "skewed keys → salting or AQE").

AQE's skew-join split handles sort-merge skew automatically; salting is
the explicit tool for the case AQE cannot fix — an aggregation or join
where ONE key dominates (e.g. a near-duplicate cluster of millions of
identical documents sharing an LSH bucket, or the UNASSIGNED approach
key in GS data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` is heavily skewed on ``key`` and ``small``
    is too large to broadcast: salt the big side with a deterministic
    per-row bucket (crc32 of the row's other content would do; here a
    uniform hash of a monotonic id), replicate the small side
    ``salt_buckets`` times, and join on (key, salt).  Each hot key's rows
    spread over ``salt_buckets`` tasks instead of one straggler."""
    b = big.withColumn(
        "_salt", (F.xxhash64(F.monotonically_increasing_id()) % salt_buckets).cast("int")
    ).withColumn("_salt", F.abs(F.col("_salt")))
    s = small.crossJoin(
        small.sparkSession.range(salt_buckets).select(F.col("id").cast("int").alias("_salt"))
    )
    out = b.join(s, [key, "_salt"], how)
    return out.drop("_salt")


def salted_count(df: DataFrame, key: str, salt_buckets: int = 16) -> DataFrame:
    """Two-phase skew-safe count per key: pre-aggregate on (key, salt)
    map-side, then combine — the hot key's partial counts merge in a
    second tiny shuffle instead of all its rows hitting one reducer.
    (Spark's hash aggregate already does map-side partials for count;
    this form matters for high-cardinality aggregates like
    collect_set/percentiles where partials are the only defense.)"""
    salted = df.withColumn(
        "_salt",
        F.abs(F.xxhash64(F.monotonically_increasing_id()) % salt_buckets).cast("int"),
    )
    partial = salted.groupBy(key, "_salt").agg(F.count("*").alias("_partial"))
    return partial.groupBy(key).agg(F.sum("_partial").alias("n"))
