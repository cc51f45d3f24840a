"""Deterministic global ordering / shuffling for training-data prep.

A training run wants the corpus in a pseudo-random order that is (a)
reproducible bit-for-bit given a seed, (b) independent of file layout,
partition count, and cluster size, and (c) assignable at 100 TB — which
rules out the textbook ``row_number() OVER (ORDER BY rand())`` twice
over: ``rand()`` is layout-dependent, and an unpartitioned window
collapses every row into ONE task.

``deterministic_shuffle`` fixes both:

- the sort key is ``md5(key ':' seed)`` — a pure function of the row's
  stable key and the seed, so the order is the same on any cluster (and
  reproducible in any other engine, which is what makes it
  oracle-checkable);
- the global index is composed scale-safely: rows hash-range into 256
  buckets by the key's first byte (uniform by construction), each
  bucket ranks locally under one partitioned window (ONE data shuffle),
  and bucket offsets — a 256-row aggregate — broadcast back.  No
  single-partition stage anywhere; the data moves once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_BUCKETS = 256  # md5 first byte: uniform, deterministic, engine-portable


def deterministic_shuffle(
    df: DataFrame,
    key_col: str,
    seed: int = 42,
    rank_col: str = "shuffle_rank",
) -> DataFrame:
    """Append a 1-based global pseudo-random rank, deterministic in
    (key, seed) and identical under any partitioning (asserted by the
    partition-count invariance suite).

    ``key_col`` must be unique per row (it is the reproducibility
    anchor); md5 of distinct strings never collides in practice, and on
    equal keys the order would tie anyway.
    """
    keyed = df.withColumn(
        "_shuf_key",
        F.md5(F.concat_ws(":", F.col(key_col).cast("string"), F.lit(str(seed)))),
    ).withColumn(
        "_bucket", F.conv(F.substring("_shuf_key", 1, 2), 16, 10).cast("int")
    )
    sizes = keyed.groupBy("_bucket").agg(F.count("*").alias("_n"))
    offsets = sizes.withColumn(
        "_offset",
        F.coalesce(
            F.sum("_n").over(
                Window.orderBy("_bucket").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("_bucket", "_offset")
    local = keyed.withColumn(
        "_local_rank",
        F.row_number().over(Window.partitionBy("_bucket").orderBy("_shuf_key")),
    )
    return (
        local.join(F.broadcast(offsets), "_bucket")
        .withColumn(rank_col, (F.col("_offset") + F.col("_local_rank")).cast("long"))
        .drop("_shuf_key", "_bucket", "_local_rank", "_offset")
    )
