"""Round-25 query addition: EXECUTED stateful streaming sessionization.

``sessionize_stream_executed`` — the custom stateful operator
(``streaming/stateful.sessionize``: ``applyInPandasWithState``, one
open-session struct per key, append mode) run as a REAL Structured
Streaming job — file source, ``availableNow`` trigger, state store,
memory sink — with its drained output value-hashed by the driver's
DuckDB oracle.  Round 18 put the built-in streaming operators (window
agg, dropDuplicates) under the oracle; this puts the hand-written
state-machine operator there too.

Determinism contract: ``availableNow`` over the single parquet file
drains in one micro-batch, so every key's events reach the state
function together and the emitted CLOSED sessions are exactly the
batch gaps-and-islands sessions minus the final (still-open) session
per key — the state store holds the open tail and the processing-time
timeout never fires before termination.  That "all but the last
session per sensor" set is SQL-expressible, so the oracle is the
``sessionize_batch`` CTE with the max-session-id row excluded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_GAP_SECONDS = 1800


def sessionize_stream_executed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(sensor, session_start, session_end, n_readings) — closed
    sessions emitted by the executed stateful stream, ordered by
    (sensor, session_start)."""
    from atd_data_lake_spark.round18_queries import _events_stream
    from atd_data_lake_spark.streaming.stateful import sessionize

    src = _events_stream(spark, sf_dir)
    readings = src.select(
        F.col("user_id").cast("string").alias("sensor"),
        # NTZ -> instant relabel (watermark needs an instant; the
        # session tz is pinned UTC so emitted values line up with the
        # oracle's naive timestamps)
        F.to_utc_timestamp("ts", "UTC").alias("ts"),
    )
    sessions = sessionize(readings, gap_seconds=_GAP_SECONDS, watermark="1 hour")

    name = "sessionize_stream_sink"
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    query = (
        sessions.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    # availableNow does NOT self-terminate here: ProcessingTimeTimeout
    # keeps MicroBatchExecution scheduling empty batches until every open
    # session's gap timer fires (~30 min of no-data spin, observed as
    # hundreds of empty micro-batches).  The single input file drains in
    # the first data batch, after which the sink already holds every
    # gap-closed session — so poll for that batch's commit and stop.
    from atd_data_lake_spark.streaming.control import stop_after_data_batch

    stop_after_data_batch(query)
    return spark.table(name).orderBy("sensor", "session_start")


SESSIONIZE_STREAM_EXECUTED_SQL = f"""
WITH lagged AS (
    SELECT CAST(user_id AS VARCHAR) AS sensor, ts,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch(ts) - epoch(lag(ts) OVER w) >= {_GAP_SECONDS}
                THEN 1 ELSE 0 END AS new_sess
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
    SELECT sensor, ts,
           sum(new_sess) OVER (PARTITION BY sensor ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_id
    FROM lagged
),
s AS (
    SELECT sensor, session_id,
           min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_readings
    FROM sess GROUP BY 1, 2
),
m AS (SELECT sensor, max(session_id) AS last_id FROM s GROUP BY 1)
SELECT s.sensor, s.session_start, s.session_end, s.n_readings
FROM s JOIN m USING (sensor)
WHERE s.session_id < m.last_id
ORDER BY s.sensor, s.session_start
"""


ROUND25_QUERIES = {"sessionize_stream_executed": sessionize_stream_executed}
ROUND25_ORACLES = {
    "sessionize_stream_executed": SESSIONIZE_STREAM_EXECUTED_SQL
}
