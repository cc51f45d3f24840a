"""radius_join: grid-bucketed spatial join vs brute force."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from atd_data_lake_spark.operators.spatialjoin import radius_join


def _points(spark, rows):
    return spark.createDataFrame(rows, "id long, x double, y double")


def _brute(spark, left, right, r):
    l = left.select(
        F.col("id").alias("lid"), F.col("x").alias("lx"), F.col("y").alias("ly")
    )
    rr = right.select(
        F.col("id").alias("rid"), F.col("x").alias("rx"), F.col("y").alias("ry")
    )
    d = F.sqrt(
        (F.col("lx") - F.col("rx")) * (F.col("lx") - F.col("rx"))
        + (F.col("ly") - F.col("ry")) * (F.col("ly") - F.col("ry"))
    )
    return l.crossJoin(rr).filter(d <= r).select("lid", "rid")


def test_matches_bruteforce_random(spark):
    rng = random.Random(42)
    pts = [(i, rng.uniform(0, 10), rng.uniform(0, 10)) for i in range(120)]
    left = _points(spark, pts[:60])
    right = _points(spark, pts[60:])
    got = sorted(
        (r["l_id"], r["r_id"])
        for r in radius_join(left, right, radius=0.8).collect()
    )
    want = sorted(tuple(r) for r in _brute(spark, left, right, 0.8).collect())
    assert got == want
    assert got  # non-vacuous


def test_cell_boundary_pairs_found_once(spark):
    # points straddling a cell boundary at exactly radius apart
    left = _points(spark, [(0, 0.999999, 5.0)])
    right = _points(
        spark,
        [(1, 1.000001, 5.0), (2, 1.999999, 5.0), (3, 2.1, 5.0)],
    )
    out = radius_join(left, right, radius=1.0).select("l_id", "r_id")
    rows = sorted(tuple(r) for r in out.collect())
    # r_id 1 (2µ away) and 2 (1.0 - 2µ away) in range; 3 is out
    assert rows == [(0, 1), (0, 2)]


def test_plan_is_equi_join(spark):
    left = _points(spark, [(0, 1.0, 1.0)])
    right = _points(spark, [(1, 1.2, 1.2)])
    plan = (
        radius_join(left, right, radius=1.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
