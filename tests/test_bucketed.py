"""Bucketed co-located joins: two tables bucketed by the same key into
the same bucket count must join with ZERO exchanges (the shuffle was
paid once at write time), and the result must equal the plain join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from atd_data_lake_spark.io.bucketed import read_table, write_bucketed


@pytest.fixture()
def no_broadcast(spark):
    """Disable broadcast + AQE so the test observes the raw bucket-join
    plan (a broadcast would trivially have no exchange)."""
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
    spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def test_bucketed_join_has_no_exchange(spark, no_broadcast):
    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("a")
    )
    right = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("b")
    )
    try:
        write_bucketed(left, "t_bkt_left", ["k"], 4, sort_cols=["k"])
        write_bucketed(right, "t_bkt_right", ["k"], 4, sort_cols=["k"])

        j = read_table(spark, "t_bkt_left").join(read_table(spark, "t_bkt_right"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucket join still shuffles:\n{plan}"
        # bucket-sorted inputs also skip the sort-merge sort
        assert "SortMergeJoin" in plan

        got = {(r["k"], r["a"], r["b"]) for r in j.collect()}
        want = {
            (r["k"], r["a"], r["b"])
            for r in left.join(right, "k").collect()
        }
        assert got == want and len(got) == 500
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bkt_left")
        spark.sql("DROP TABLE IF EXISTS t_bkt_right")


def test_plain_parquet_read_would_shuffle(spark, no_broadcast, tmp_path):
    """Control: the same data written as plain parquet (no bucket
    metadata) joins WITH an exchange — proving the bucket metadata, not
    the data layout, is what removes the shuffle."""
    left = spark.range(0, 1000).select(F.col("id").alias("k"))
    right = spark.range(0, 500).select(F.col("id").alias("k"))
    left.write.parquet(str(tmp_path / "l"))
    right.write.parquet(str(tmp_path / "r"))
    j = spark.read.parquet(str(tmp_path / "l")).join(
        spark.read.parquet(str(tmp_path / "r")), "k"
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan
