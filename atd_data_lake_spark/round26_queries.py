"""Round-26 query additions: executed stream-stream join and RFM
customer segmentation.

``evt_stream_join_executed`` — the last unexercised Structured
Streaming surface: a watermarked STREAM-STREAM inner join (clicks ⋈
purchases per user within a 30-minute event-time band), run as a real
job — file source, join state store on both sides, append-mode memory
sink — and value-hashed against a plain SQL band-join oracle.  Rounds
18/25 executed the built-in windowed agg / dropDuplicates and the
custom ``applyInPandasWithState`` operator; this adds the two-sided
join state machine (per-key buffered rows, watermark-driven eviction).

Determinism contract: inner stream-stream joins emit a match in the
micro-batch where both rows are present; ``availableNow`` over the
single parquet file drains both branches in one batch, so the emitted
set is exactly the batch band-join — watermark eviction only trims
state afterwards and removes no output.  The query is stopped once the
data batch commits: no stateful timeout is registered, but the
poll-and-stop guard (see round25) keeps the wall-time bounded even if
the no-data watermark-commit batch lingers.

``rfm_segments`` — classic warehouse RFM (recency / frequency /
monetary) segmentation over orders, the canonical "score customers by
quartile" workload (reference analog: the perfmet layer's per-sensor
scoring, perfmet.py; here per customer).  Scale design: one groupBy
shuffle on o_custkey builds the per-customer profile; the reference
date is a 1-row aggregate broadcast (no second scan barrier); the
three quartile scores are ntile windows over the SAME single-partition
frame — at 100 TB the profile table is |customers| rows (orders of
magnitude smaller than the fact table), so the windows run on the
reduced side only.  Tie discipline: every ntile orders by a UNIQUE
(metric, c_custkey) key, and monetary ranks on the exact DECIMAL sum,
not the rounded double, so Spark and DuckDB tile identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_JOIN_WINDOW_MIN = 30


def evt_stream_join_executed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(click_id, purchase_id, user_id, lag_us) — each purchase within
    30 minutes at-or-after a click by the same user, from an executed
    watermarked stream-stream join."""
    from atd_data_lake_spark.round18_queries import _events_stream

    src = _events_stream(spark, sf_dir)
    ev = src.select(
        "event_id",
        F.to_utc_timestamp("ts", "UTC").alias("its"),
        "user_id",
        "event_type",
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("its").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("its").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {_JOIN_WINDOW_MIN} MINUTES")),
        "inner",
    ).select(
        "click_id",
        "purchase_id",
        F.col("c_user").alias("user_id"),
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("lag_us"),
    )

    name = "evt_stream_join_sink"
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    query = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    # Inner-join output is complete once the single data batch commits
    # (eviction batches that follow only clean state) — stop then.
    from atd_data_lake_spark.streaming.control import stop_after_data_batch

    stop_after_data_batch(query)
    return spark.table(name).orderBy("click_id", "purchase_id")


EVT_STREAM_JOIN_EXECUTED_SQL = f"""
SELECT c.event_id AS click_id,
       p.event_id AS purchase_id,
       c.user_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
FROM events c
JOIN events p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts
 AND p.ts <= c.ts + INTERVAL {_JOIN_WINDOW_MIN} MINUTE
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
ORDER BY click_id, purchase_id
"""


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(c_custkey, recency_days, frequency, monetary, r_q, f_q, m_q,
    segment) — RFM quartile scores per ordering customer."""
    from atd_data_lake_spark.queries import _t

    o = _t(spark, sf_dir, "orders")
    profile = o.groupBy("o_custkey").agg(
        F.max(F.col("o_orderdate").cast("date")).alias("_last"),
        F.count("*").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("_mon"),
    )
    # 1-row reference date, broadcast — no global-barrier second window
    ref = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("_ref"))
    prof = profile.crossJoin(F.broadcast(ref)).select(
        F.col("o_custkey").alias("c_custkey"),
        F.datediff("_ref", "_last").alias("recency_days"),
        "frequency",
        "_mon",
    )
    # unique ntile orders (metric, custkey); monetary tiles on the exact
    # decimal, and scores are oriented so 4 = best
    w_r = Window.orderBy(F.col("recency_days").desc(), F.col("c_custkey"))
    w_f = Window.orderBy(F.col("frequency").asc(), F.col("c_custkey"))
    w_m = Window.orderBy(F.col("_mon").asc(), F.col("c_custkey"))
    scored = prof.select(
        "c_custkey",
        "recency_days",
        "frequency",
        F.round(F.col("_mon").cast("double"), 2).alias("monetary"),
        F.ntile(4).over(w_r).alias("r_q"),
        F.ntile(4).over(w_f).alias("f_q"),
        F.ntile(4).over(w_m).alias("m_q"),
    )
    seg = (
        F.when((F.col("r_q") == 4) & (F.col("f_q") == 4) & (F.col("m_q") == 4), "champion")
        .when((F.col("r_q") >= 3) & (F.col("f_q") >= 3), "loyal")
        .when((F.col("r_q") <= 1) & (F.col("f_q") >= 3), "at_risk")
        .when((F.col("r_q") <= 1) & (F.col("f_q") <= 1), "lost")
        .otherwise("regular")
    )
    return scored.withColumn("segment", seg).orderBy("c_custkey")


RFM_SEGMENTS_SQL = """
WITH profile AS (
    SELECT o_custkey AS c_custkey,
           max(CAST(o_orderdate AS DATE)) AS last_order,
           count(*) AS frequency,
           sum(CAST(o_totalprice AS DECIMAL(18,2))) AS mon
    FROM orders GROUP BY 1
),
ref AS (SELECT max(CAST(o_orderdate AS DATE)) AS ref_date FROM orders),
prof AS (
    SELECT c_custkey,
           date_diff('day', last_order, ref_date) AS recency_days,
           frequency, mon
    FROM profile CROSS JOIN ref
),
scored AS (
    SELECT c_custkey, recency_days, frequency,
           round(CAST(mon AS DOUBLE), 2) AS monetary,
           ntile(4) OVER (ORDER BY recency_days DESC, c_custkey) AS r_q,
           ntile(4) OVER (ORDER BY frequency ASC, c_custkey) AS f_q,
           ntile(4) OVER (ORDER BY mon ASC, c_custkey) AS m_q
    FROM prof
)
SELECT c_custkey, recency_days, frequency, monetary, r_q, f_q, m_q,
       CASE WHEN r_q = 4 AND f_q = 4 AND m_q = 4 THEN 'champion'
            WHEN r_q >= 3 AND f_q >= 3 THEN 'loyal'
            WHEN r_q <= 1 AND f_q >= 3 THEN 'at_risk'
            WHEN r_q <= 1 AND f_q <= 1 THEN 'lost'
            ELSE 'regular' END AS segment
FROM scored
ORDER BY c_custkey
"""


ROUND26_QUERIES = {
    "evt_stream_join_executed": evt_stream_join_executed,
    "rfm_segments": rfm_segments,
}
ROUND26_ORACLES = {
    "evt_stream_join_executed": EVT_STREAM_JOIN_EXECUTED_SQL,
    "rfm_segments": RFM_SEGMENTS_SQL,
}
