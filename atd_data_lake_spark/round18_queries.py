"""Round-18 query additions: EXECUTED Structured Streaming queries
under the driver oracle.

``a1_streaming_parity`` checks the streaming TRANSFORM on a batch
frame; these two go further — each registered query actually runs a
Structured Streaming job (file source over the same parquet,
``availableNow`` trigger, memory sink), waits for it to drain, and
returns the sink table.  The driver's DuckDB oracle then value-hashes
the OUTPUT OF A REAL STREAM EXECUTION — micro-batch planner, state
store, watermarks and all:

- ``evt_stream_executed`` — watermarked 15-minute tumbling aggregation
  (count + exact-decimal value sum) in complete mode.  With
  ``availableNow`` the source drains to one final complete emission, so
  the result equals the batch aggregation bit-for-bit.
- ``evt_stream_dedup_executed`` — streaming ``dropDuplicates`` on the
  (user, day) key feeding a complete-mode per-user count: the
  first-event-per-day dedup every ingest stream runs, externally
  checked against DuckDB's COUNT(DISTINCT day).

Both reuse the engine's NTZ discipline (event time relabelled to an
instant before the watermark) and clean up their named memory sinks so
re-invocation in a long-lived session is safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table (schema pinned from the
    batch reader; pathGlobFilter selects the one table file)."""
    from atd_data_lake_spark.io.reader import read_table

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = read_table(spark, sf_dir, "events").schema
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )


def _run_to_memory(agg: DataFrame, name: str, spark: SparkSession) -> DataFrame:
    """Execute a streaming frame into a named memory sink (complete
    mode, availableNow) and return the drained sink table."""
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    query = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name)


def evt_stream_executed(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = _events_stream(spark, sf_dir)
    its = F.to_utc_timestamp("ts", "UTC")
    agg = (
        src.select(
            its.alias("its"),
            "event_type",
            F.col("value").cast("decimal(12,2)").alias("v"),
        )
        .withWatermark("its", "30 minutes")
        .groupBy(F.window("its", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("v").cast("double"), 2).alias("total_value"),
        )
    )
    out = _run_to_memory(agg, "evt_stream_executed_sink", spark)
    return out.select(
        F.col("w.start").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    ).orderBy("window_start", "event_type")


EVT_STREAM_EXECUTED_SQL = """
SELECT make_timestamp(CAST(floor(epoch(ts) / 900) AS BIGINT) * 900 * 1000000)
         AS window_start,
       event_type,
       count(*) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE), 2)
         AS total_value
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
"""


def evt_stream_dedup_executed(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = _events_stream(spark, sf_dir)
    its = F.to_utc_timestamp("ts", "UTC")
    deduped = (
        src.select(its.alias("its"), "user_id")
        .withColumn("day", F.to_date("its"))
        .withWatermark("its", "1 day")
        .dropDuplicates(["user_id", "day"])
    )
    agg = deduped.groupBy("user_id").agg(F.count("*").alias("n_active_days"))
    out = _run_to_memory(agg, "evt_stream_dedup_sink", spark)
    return out.select("user_id", "n_active_days").orderBy("user_id")


EVT_STREAM_DEDUP_EXECUTED_SQL = """
SELECT user_id, count(DISTINCT CAST(ts AS DATE)) AS n_active_days
FROM events
GROUP BY user_id
ORDER BY user_id
"""


ROUND18_QUERIES = {
    "evt_stream_executed": evt_stream_executed,
    "evt_stream_dedup_executed": evt_stream_dedup_executed,
}

ROUND18_ORACLES = {
    "evt_stream_executed": EVT_STREAM_EXECUTED_SQL,
    "evt_stream_dedup_executed": EVT_STREAM_DEDUP_EXECUTED_SQL,
}
