"""Streaming transforms (SURVEY §2.9).

Each function takes/returns (streaming) DataFrames, so the SAME logical
transform code runs in batch and streaming — handing a batch DataFrame
to ``tumbling_agg_stream`` produces the batch A1 result; handing a
``readStream`` source produces the incremental one.  That is the point
of Structured Streaming, and it is why the engine keeps the
aggregation as a plain groupBy(window(...)).

Watermark sizing: the reference's GS ``day_covered`` mechanism exists
because device clocks drift by minutes-to-hours and a record logged
under day D may belong to D±1 (docs/datasrc_gs.md:217-227).  A "1 day"
watermark covers the worst drift observed there while bounding state to
(windows/day × sensors) rows per day — at 1000 sensors × 96 windows
that is trivially small on any cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def stream_csv_source(
    spark,
    path: str,
    schema: T.StructType,
    header: bool = False,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """S1/S2/S3 as a file stream: new files landing in the drop directory
    are discovered per micro-batch (the streaming analog of the
    dated-filename directory scan, util/date_dirs.py:33-170 — the date is
    carried by the data, not the filename)."""
    reader = spark.readStream.schema(schema).option("header", str(header).lower())
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.csv(path)


def tumbling_agg_stream(
    df: DataFrame,
    ts_col: str = "timestamp_adj",
    keys: list[str] | None = None,
    interval_sec: int = 900,
    watermark: str = "1 day",
    value_cols: tuple[str, str] = ("speed", "seconds_in_zone"),
) -> DataFrame:
    """A1 as a streaming windowed aggregation (SURVEY §2.9: batch A1 →
    ``groupBy(window(...))`` + ``withWatermark``): volume + mean/sample-
    stddev per (window, keys), stddev-of-one → 0, round(3) — identical
    output columns to ``pipelines.gs.agg_interval``.

    Late data within the watermark updates its window (replacing U1's
    cross-day union); rows later than the watermark are dropped (the
    streaming form of P6's same-day exclusion).

    Stddev uses the exact decimal-sum construction (``gs._exact_std``):
    the sums are plain associative aggregates, so the same expression is
    incrementally maintainable by the streaming state store, and batch
    and streaming runs produce bit-identical doubles."""
    from atd_data_lake_spark.pipelines.gs import _exact_std

    keys = keys if keys is not None else ["zone_approach", "turn", "heavy_vehicle"]
    a, b = value_cols
    grouped = (
        df.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), f"{interval_sec} seconds").alias("_w"), *keys
        )
        .agg(
            F.count("*").alias("volume"),
            F.round(F.avg(a), 3).alias(f"{a}_avg"),
            F.round(_exact_std(a), 3).alias(f"{a}_std"),
            F.round(F.avg(b), 3).alias(f"{b}_avg"),
            F.round(_exact_std(b), 3).alias(f"{b}_std"),
        )
    )
    return grouped.select(
        F.col("_w.start").alias("timestamp"), *keys, "volume",
        f"{a}_avg", f"{a}_std", f"{b}_avg", f"{b}_std",
    )


def dedup_stream(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    watermark: str = "1 day",
) -> DataFrame:
    """Exact streaming dedup: the first arrival of each key survives;
    re-deliveries within the watermark horizon are dropped with BOUNDED
    state (``dropDuplicatesWithinWatermark`` expires a key's state once
    the watermark passes it — plain ``dropDuplicates`` on a stream would
    grow state forever).

    This is the streaming analog of both ``operators/dedup.exact_dedup``
    (key = content hash) and the reference's J1 incremental anti-join
    guard against reprocessing already-cataloged items
    (support/etl_app.py:257-285): at-least-once upstream delivery
    becomes exactly-once downstream within the horizon.  On a batch
    DataFrame the same call degrades to a plain dropDuplicates (Spark
    routes by execution mode), keeping the batch ≡ stream contract."""
    out = df.withWatermark(ts_col, watermark)
    if df.isStreaming:
        return out.dropDuplicatesWithinWatermark(key_cols)
    return df.dropDuplicates(key_cols)


def sensor_obs_stream(
    df: DataFrame,
    sensor_col: str,
    ts_col: str,
    watermark: str = "1 day",
) -> DataFrame:
    """A3 as a stream: per-sensor daily observation counts + min/max
    timestamp (bt_json_standard.py:146-157) with daily tumbling windows —
    the perfmet feed becomes continuously current instead of nightly."""
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), "1 day").alias("_w"), sensor_col)
        .agg(
            F.count("*").alias("n_obs"),
            F.min(ts_col).alias("min_ts"),
            F.max(ts_col).alias("max_ts"),
        )
        .select(F.col("_w.start").alias("day"), sensor_col, "n_obs", "min_ts", "max_ts")
    )


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    window_seconds: int = 300,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream interval join: the streaming twin of
    ``operators.rangejoin.time_window_join`` — right rows in the band
    ``(left.ts, left.ts + window]`` per key.

    Batch Spark has no band-join operator (hence the bucketized rewrite
    in rangejoin.py), but Structured Streaming DOES: a stream-stream
    inner join whose condition carries a time bound.  The bound is not
    just semantics — it is what lets the state store EXPIRE rows: with
    watermarks on both sides, Spark proves a left row can never match
    once the right watermark passes ``l_ts + window`` and drops it
    (state stays O(rate × window), not O(stream)).

    Column contract: timestamps must arrive pre-renamed to distinct
    names (``l_ts``/``r_ts``) because stream-stream join conditions
    reference both sides' columns in one expression.  On batch inputs
    the identical call degrades to a plain equi-join + band filter, so
    stream ≡ batch is testable row-for-row (test_streaming.py).
    """
    l = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    r = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    cond = (
        (F.col(right_ts) > F.col(left_ts))
        & (
            F.col(right_ts)
            <= F.col(left_ts) + F.expr(f"INTERVAL {int(window_seconds)} SECONDS")
        )
        & (F.col(f"l_{on}") == F.col(f"r_{on}"))
    )
    return l.join(r, cond)
