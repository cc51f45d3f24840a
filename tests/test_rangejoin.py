"""time_window_join: bucketized band join vs brute-force reference.

The operator's claim is exact equivalence to the O(n*m) band join —
every (l, r) pair with r.ts in (l.ts, l.ts + w] appears exactly once —
while the physical plan stays an equi-join (no nested loop, no
cartesian).  Both claims are asserted here.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from atd_data_lake_spark.operators.rangejoin import time_window_join


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, k, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(rows)],
        "id long, k string, ts timestamp",
    )


def _brute(left, right, w):
    l = left.select(
        F.col("k"), F.col("id").alias("l_id"), F.col("ts").alias("l_ts")
    )
    r = right.select(
        F.col("k").alias("rk"), F.col("id").alias("r_id"), F.col("ts").alias("r_ts")
    )
    return (
        l.join(r, l.k == r.rk)
        .filter(
            (F.unix_micros("r_ts") > F.unix_micros("l_ts"))
            & (
                F.unix_micros("r_ts") - F.unix_micros("l_ts")
                <= w * 1_000_000
            )
        )
        .select("l_id", "r_id")
    )


def test_matches_bruteforce(spark):
    # seconds chosen to cross bucket boundaries: w=10 buckets at :00/:10/:20
    left = _events(
        spark,
        [("a", 0), ("a", 9), ("a", 10), ("a", 25), ("b", 5), ("c", 100)],
    )
    right = _events(
        spark,
        [("a", 1), ("a", 10), ("a", 19), ("a", 20), ("a", 36), ("b", 14), ("b", 16)],
    )
    got = (
        time_window_join(left, right, on=["k"], left_ts="ts", right_ts="ts", window_seconds=10)
        .select("l_id", "r_id")
    )
    want = _brute(left, right, 10)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_no_duplicate_pairs(spark):
    # r exactly at l + w matches via the second bucket only; r in l's own
    # bucket matches via the first only — each true pair appears ONCE.
    left = _events(spark, [("a", 0)])
    right = _events(spark, [("a", 1), ("a", 10)])  # in-bucket and boundary
    out = time_window_join(
        left, right, on=["k"], window_seconds=10
    ).select("l_id", "r_id")
    rows = sorted(map(tuple, out.collect()))
    assert rows == [(0, 0), (0, 1)]


def test_band_is_half_open(spark):
    # r.ts == l.ts is excluded; r.ts == l.ts + w is included
    left = _events(spark, [("a", 50)])
    right = _events(spark, [("a", 50), ("a", 60), ("a", 61)])
    out = time_window_join(left, right, on=["k"], window_seconds=10)
    assert sorted(r.r_id for r in out.collect()) == [1]


def test_plan_is_equi_join(spark):
    left = _events(spark, [("a", 0), ("b", 5)])
    right = _events(spark, [("a", 1), ("b", 6)])
    plan = (
        time_window_join(left, right, on=["k"], window_seconds=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cross_midnight_and_microseconds(spark):
    # sub-second gaps: 0.5s window, microsecond timestamps
    base = dt.datetime(2024, 1, 1, 23, 59, 59, 900000)
    left = spark.createDataFrame(
        [(0, "a", base)], "id long, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, "a", base + dt.timedelta(microseconds=400000)),
            (2, "a", base + dt.timedelta(microseconds=500000)),  # == bound
            (3, "a", base + dt.timedelta(microseconds=500001)),  # past it
        ],
        "id long, k string, ts timestamp",
    )
    out = time_window_join(left, right, on=["k"], window_seconds=1)
    # 1s window: all three qualify (400001µs .. 500001µs < 1s)
    assert sorted(r.r_id for r in out.collect()) == [1, 2, 3]


def test_pre_epoch_timestamps_bucket_correctly(spark):
    # negative epoch seconds: pmod keeps bucket starts on the floor grid
    import datetime as dt

    base = dt.datetime(1969, 12, 31, 23, 59, 55)  # 5s before the epoch
    left = spark.createDataFrame(
        [(0, "a", base)], "id long, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, "a", base + dt.timedelta(seconds=3)),   # crosses epoch 0
            (2, "a", base + dt.timedelta(seconds=10)),  # == bound
            (3, "a", base + dt.timedelta(seconds=11)),  # out of band
        ],
        "id long, k string, ts timestamp",
    )
    out = time_window_join(left, right, on=["k"], window_seconds=10)
    assert sorted(r.r_id for r in out.collect()) == [1, 2]
