"""The HLL sketch-rollup's accuracy contract: the merged per-day
sketches must estimate the exact 7-day rolling distinct within HLL
error bounds, and merging must be order/partitioning-insensitive."""

from __future__ import annotations

from pyspark.sql import functions as F


def _exact_rolling(spark, sf_dir):
    from atd_data_lake_spark.round11_queries import _t

    ev = _t(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    act = ev.distinct()
    fed = act.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("report_day"),
        "user_id",
    ).join(
        F.broadcast(act.select("day").distinct().withColumnRenamed("day", "report_day")),
        "report_day",
        "left_semi",
    )
    return {
        r["report_day"]: r["n"]
        for r in fed.groupBy("report_day")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }


def test_hll_rollup_matches_exact_within_bounds(spark, sf_dir):
    from atd_data_lake_spark.round11_queries import evt_rolling_active_hll

    est = {
        r["report_day"]: r["active_estimate"]
        for r in evt_rolling_active_hll(spark, sf_dir).collect()
    }
    exact = _exact_rolling(spark, sf_dir)
    assert set(est) == set(exact)
    for day, n in exact.items():
        # Datasketches HLL (lgK=12 default): relative error well under 5%
        # at these cardinalities; small counts are exact
        assert abs(est[day] - n) <= max(1, 0.05 * n), (day, est[day], n)


def test_hll_rollup_partition_invariant(spark, sf_dir):
    from atd_data_lake_spark.round11_queries import evt_rolling_active_hll

    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        one = sorted(map(tuple, evt_rolling_active_hll(spark, sf_dir).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        thirteen = sorted(
            map(tuple, evt_rolling_active_hll(spark, sf_dir).collect())
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert one == thirteen
