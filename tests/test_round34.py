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


def test_append_mode_eviction_boundary_pinned(spark, tmp_path):
    """ADVICE r7: when max(event_time) - 30min lands EXACTLY on a 15-min
    window end, the oracle's inclusive `window_end <= max_ts - 1800`
    must match Spark's append-mode eviction comparison.  Synthetic
    events pin the equality case the sf data never hits: watermark
    00:15:00 == the first window's end."""
    import datetime as _dt

    base = _dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base + _dt.timedelta(minutes=1), 1, "A", 1.0, "{}"),
        (2, base + _dt.timedelta(minutes=14), 1, "A", 2.0, "{}"),
        (3, base + _dt.timedelta(minutes=16), 1, "A", 3.0, "{}"),
        # max event: watermark = 00:45 - 30min = 00:15:00 exactly
        (4, base + _dt.timedelta(minutes=45), 1, "B", 4.0, "{}"),
    ]
    # a single FILE named events.parquet (like the testdata layout) —
    # the stream's pathGlobFilter matches leaf file names, so a
    # directory-shaped Spark write would be filtered to nothing
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    out = evt_stream_append_window_executed(spark, str(tmp_path)).collect()
    # inclusive boundary: the window ENDING exactly at the watermark is
    # finalized and emitted; the 00:15 and 00:45 windows are not
    assert [
        (r["window_start"], r["event_type"], r["n_events"], r["total_value"])
        for r in out
    ] == [(base, "A", 2, 3.0)]
