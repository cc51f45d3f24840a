"""Bucketized time-window (range) join.

Spark has no native band/range join operator: an inequality-only join
condition (``r.ts BETWEEN l.ts AND l.ts + w``) falls back to
BroadcastNestedLoopJoin or CartesianProduct — O(n*m) comparisons that
never survive a 100 TB input.  The standard scale-out trick (used by
Databricks' range-join hint, Flink's interval join, and the
bucketing literature) turns the band predicate into an EQUI-join:

1. quantize both sides' timestamps into fixed-width buckets of exactly
   the window width ``w`` (epoch-microsecond integer division — no
   float drift);
2. explode the LEFT side to the two buckets its window can reach
   (``floor(ts/w)`` and ``floor(ts/w)+1``); the right side keeps its
   single home bucket;
3. hash-join on (key..., bucket) — a plain shuffled/broadcast equi-join
   Catalyst knows how to distribute and AQE knows how to skew-split;
4. re-apply the exact band predicate to discard the false candidates.

Every true pair (l, r) with ``r.ts`` in ``(l.ts, l.ts + w]`` matches on
exactly ONE bucket value — r's home bucket, which is either l's home
bucket or the next one — so the output needs no de-duplication.

Cost: one explode (2x the left side, which should be the *filtered*,
smaller stream) + one equi-join shuffle on (key, bucket).  Candidate
blowup is bounded by bucket population, not table size.

Reference parity: the reference has no band join (its joins are all
key-equality, SURVEY §2.3); this operator is part of the
beyond-reference analytics surface (BASELINE.json north star) that a
100 TB event pipeline needs (e.g. "events within 5 minutes after an
error").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from atd_data_lake_spark.functions.datetime_fns import as_instant


def time_window_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    window_seconds: int = 300,
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Join each left row to right rows with the same ``on`` keys and
    ``right.ts`` in the half-open band ``(left.ts, left.ts + window]``.

    Output columns: the ``on`` keys once, then every other left column
    prefixed ``left_prefix`` and every other right column prefixed
    ``right_prefix``.  Timestamps compare in integer epoch microseconds
    (exact; no double rounding).
    """
    w_us = int(window_seconds) * 1_000_000

    l_us = F.unix_micros(as_instant(left, left_ts))
    r_us = F.unix_micros(as_instant(right, right_ts))

    lcols = [c for c in left.columns if c not in on]
    rcols = [c for c in right.columns if c not in on]

    # bucket key = bucket START in µs (ts - ts mod w): pure long modulo
    # arithmetic, no float division anywhere.  pmod (not %) so pre-1970
    # timestamps (negative epoch) still floor to their bucket start.
    l_home = l_us - F.pmod(l_us, F.lit(w_us))
    r_home = r_us - F.pmod(r_us, F.lit(w_us))
    l = left.select(
        *on,
        *[F.col(c).alias(left_prefix + c) for c in lcols],
        l_us.alias("_l_us"),
        F.explode(F.array(l_home, l_home + F.lit(w_us))).alias("_bkt"),
    )
    r = right.select(
        *on,
        *[F.col(c).alias(right_prefix + c) for c in rcols],
        r_us.alias("_r_us"),
        r_home.alias("_bkt"),
    )

    joined = l.join(r, on + ["_bkt"]).filter(
        (F.col("_r_us") > F.col("_l_us"))
        & (F.col("_r_us") - F.col("_l_us") <= F.lit(w_us))
    )
    return joined.drop("_bkt", "_l_us", "_r_us")
