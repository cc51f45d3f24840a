"""applyInPandasWithState sessionization test: gap-closed sessions emit
with exact boundaries; the still-open tail session stays in state."""

from __future__ import annotations

import pytest

from atd_data_lake_spark.streaming.stateful import sessionize

CSV = """\
2019-06-03T10:00:00,reader_a
2019-06-03T10:05:00,reader_a
2019-06-03T10:10:00,reader_a
2019-06-03T12:00:00,reader_a
2019-06-03T12:01:00,reader_a
2019-06-03T15:00:00,reader_a
2019-06-03T10:00:00,reader_b
2019-06-03T11:30:00,reader_b
"""


def test_sessionize_gap_splits(spark, tmp_path):
    (tmp_path / "in").mkdir()
    (tmp_path / "in" / "r.csv").write_text(CSV)
    schema = "ts timestamp, sensor string"
    stream = (
        spark.readStream.schema(spark.createDataFrame([], schema).schema)
        .csv(str(tmp_path / "in"))
    )
    sessions = sessionize(stream, gap_seconds=1800)  # 30-min gap
    q = (
        sessions.writeStream.format("memory")
        .queryName("t_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    # ProcessingTimeTimeout keeps availableNow spinning empty batches
    # until the open tail session's timer fires — awaitTermination(120)
    # burned its FULL timeout here (2 min per test).  The single input
    # file drains in the first data batch, after which the sink holds
    # every gap-closed session: poll for that batch and stop (the
    # registry queries' pattern).
    from atd_data_lake_spark.streaming.control import stop_after_data_batch

    stop_after_data_batch(q)
    rows = spark.sql("SELECT * FROM t_sessions").collect()
    got = {
        (r["sensor"], str(r["session_start"])): (str(r["session_end"]), r["n_readings"])
        for r in rows
    }
    # reader_a: session 1 = 10:00-10:10 (3 readings), closed by the 12:00 gap;
    # session 2 = 12:00-12:01 (2), closed by the 15:00 gap; the 15:00 session
    # is still open (only a timeout would close it) -> not emitted.
    assert got[("reader_a", "2019-06-03 10:00:00")] == ("2019-06-03 10:10:00", 3)
    assert got[("reader_a", "2019-06-03 12:00:00")] == ("2019-06-03 12:01:00", 2)
    # reader_b: 10:00 closed by the 11:30 gap (1 reading)
    assert got[("reader_b", "2019-06-03 10:00:00")] == ("2019-06-03 10:00:00", 1)
    assert len(got) == 3


def test_sessionize_batch_matches_stateful_closed_sessions(spark, tmp_path):
    """The gaps-and-islands batch twin produces the SAME sessions as the
    stateful streaming operator — the batch result is the closed sessions
    plus each sensor's still-open tail session."""
    from atd_data_lake_spark.streaming.stateful import sessionize_batch

    (tmp_path / "in").mkdir()
    (tmp_path / "in" / "r.csv").write_text(CSV)
    schema = "ts timestamp, sensor string"

    stream = (
        spark.readStream.schema(spark.createDataFrame([], schema).schema)
        .csv(str(tmp_path / "in"))
    )
    q = (
        sessionize(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("t_sessions_eq")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    # poll-then-stop, not awaitTermination(120) — see test_sessionize_gap_splits
    from atd_data_lake_spark.streaming.control import stop_after_data_batch

    stop_after_data_batch(q)
    closed = {
        (r["sensor"], str(r["session_start"]), str(r["session_end"]), r["n_readings"])
        for r in spark.sql("SELECT * FROM t_sessions_eq").collect()
    }

    batch_df = spark.read.schema(
        spark.createDataFrame([], schema).schema
    ).csv(str(tmp_path / "in"))
    batch = {
        (r["sensor"], str(r["session_start"]), str(r["session_end"]), r["n_readings"])
        for r in sessionize_batch(batch_df, gap_seconds=1800).collect()
    }
    # open tails (last session per sensor) exist only in the batch view
    open_tails = {
        ("reader_a", "2019-06-03 15:00:00", "2019-06-03 15:00:00", 1),
        ("reader_b", "2019-06-03 11:30:00", "2019-06-03 11:30:00", 1),
    }
    assert batch == closed | open_tails


def test_sessionize_batch_timestamp_ntz(spark, sf_dir):
    """Parquet `timestamp[us]` (no tz) reads as TIMESTAMP_NTZ under Spark
    4's NTZ inference; sessionize_batch must not hit the forbidden
    `CAST(ts AS DOUBLE)` on it (the round-2 driver/bench crash).  The
    session count must also equal the LTZ view of the same data — the
    NTZ→instant relabeling may not move any session boundary."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampNTZType

    from atd_data_lake_spark.streaming.stateful import sessionize_batch

    raw = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("string").alias("sensor"), "ts"
    )
    assert isinstance(raw.schema["ts"].dataType, TimestampNTZType)
    ntz_sessions = sessionize_batch(raw, gap_seconds=1800).count()
    assert ntz_sessions > 0

    ltz = raw.withColumn("ts", F.to_utc_timestamp("ts", "UTC"))
    assert sessionize_batch(ltz, gap_seconds=1800).count() == ntz_sessions


def test_sessionize_tws_matches_applyinpandas(spark, tmp_path):
    """The transformWithStateInPandas sessionizer closes the same
    sessions as the applyInPandasWithState one on the same stream.
    Skips where google.protobuf (the transformWithState state protocol's
    dependency) is absent — this sandbox ships pyspark without it."""
    import pytest

    from atd_data_lake_spark.streaming.stateful import (
        sessionize,
        sessionize_tws,
        tws_available,
    )

    if not tws_available():
        pytest.skip("google.protobuf absent: transformWithState protocol unavailable")

    rows = [
        ("reader_a", "2019-06-03 10:00:00"),
        ("reader_a", "2019-06-03 10:10:00"),
        ("reader_a", "2019-06-03 12:00:00"),
        ("reader_a", "2019-06-03 15:00:00"),
        ("reader_b", "2019-06-03 09:00:00"),
        ("reader_b", "2019-06-03 11:30:00"),
    ]
    (tmp_path / "in").mkdir()
    with open(tmp_path / "in" / "a.csv", "w") as f:
        for s, t in rows:
            f.write(f"{s},{t}\n")
    schema = "sensor string, ts timestamp"

    def run(fn, qname):
        stream = (
            spark.readStream.schema(spark.createDataFrame([], schema).schema)
            .csv(str(tmp_path / "in"))
        )
        q = (
            fn(stream, gap_seconds=1800)
            .writeStream.format("memory")
            .queryName(qname)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            (r["sensor"], str(r["session_start"]), str(r["session_end"]), r["n_readings"])
            for r in spark.sql(f"SELECT * FROM {qname}").collect()
        }

    a = run(sessionize, "t_aip")
    b = run(sessionize_tws, "t_tws")
    assert a == b and len(a) > 0
