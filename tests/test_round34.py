"""Round-34 targeted tests: append-mode watermark semantics and the
stream-static join.  Oracle value parity is covered by the driver sweep;
these pin the STREAMING-specific contracts."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from atd_data_lake_spark.round34_queries import (
    evt_stream_append_window_executed,
    evt_stream_static_join_executed,
)


def test_append_mode_emits_only_finalized_windows(spark, sf_dir):
    """Every emitted window must be watermark-finalized
    (window_end <= max event time - 30 min) and the count must equal
    the batch aggregation restricted to that set — i.e. append emitted
    each finalized window exactly once and nothing else."""
    from atd_data_lake_spark.io.reader import read_table

    out = evt_stream_append_window_executed(spark, sf_dir).collect()
    ev = read_table(spark, sf_dir, "events")
    its = F.to_utc_timestamp("ts", "UTC")
    mx = ev.agg(F.max(its)).first()[0]
    wm = mx - datetime.timedelta(minutes=30)
    assert len(out) > 0
    for r in out:
        end = r["window_start"] + datetime.timedelta(minutes=15)
        assert end <= wm
    batch_final = (
        ev.select(its.alias("its"), "event_type")
        .groupBy(F.window("its", "15 minutes").alias("w"), "event_type")
        .count()
        .filter(F.col("w.end") <= F.lit(wm))
        .count()
    )
    assert len(out) == batch_final


def test_append_mode_rerun_is_stable(spark, sf_dir):
    a = sorted(map(tuple, evt_stream_append_window_executed(spark, sf_dir).collect()))
    b = sorted(map(tuple, evt_stream_append_window_executed(spark, sf_dir).collect()))
    assert a == b


def test_stream_static_join_matches_batch_join(spark, sf_dir):
    from atd_data_lake_spark.io.reader import read_table

    out = sorted(
        map(tuple, evt_stream_static_join_executed(spark, sf_dir).collect())
    )
    ev = read_table(spark, sf_dir, "events")
    dim = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    batch = sorted(
        map(
            tuple,
            ev.select(
                "user_id",
                "event_type",
                F.col("value").cast("decimal(12,2)").alias("v"),
            )
            .join(dim, "user_id")
            .groupBy("c_mktsegment", "event_type")
            .agg(
                F.count("*").alias("n_events"),
                F.round(F.sum("v").cast("double"), 2).alias("total_value"),
            )
            .orderBy("c_mktsegment", "event_type")
            .collect(),
        )
    )
    assert out == batch and len(out) > 0
