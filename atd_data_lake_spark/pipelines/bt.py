"""Bluetooth (bt) pipeline: raw CSV → standardized → ready → published.

Re-expresses the reference chain (bt_json_standard.py → bt_ready.py →
bt_extract_soc.py) Spark-first.  The three daily file types (IAF
"unmatched", ITMF "matched", TMSR "traf_match_summary") each get a
standardize + ready + publish transform; schemas in
``atd_data_lake_spark.schemas``.

Scale notes: device dimensions are tiny (~100 rows) → every enrichment
join broadcasts; the only shuffles in the whole chain are the final
``orderBy`` (reference output ordering, bt_ready.py:108,119-122) and the
publish daily-counter window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from atd_data_lake_spark.functions.ids import md5_concat

# Raw Bluetooth time formats (bt_json_standard.py:90-104): _parseTime uses
# %m/%d/%Y %I:%M:%S %p, _parseTimeShort drops seconds.  Java pattern
# equivalents (accept both zero-padded and not):
TIME_FMT = "M/d/yyyy h:mm:ss a"
TIME_FMT_SHORT = "M/d/yyyy h:mm a"


# ---------------------------------------------------------------------------
# standardize (raw → rawjson layer; bt_json_standard.py:106-164)
# ---------------------------------------------------------------------------


def standardize_iaf(raw: DataFrame) -> DataFrame:
    """IAF "unmatched": parse the two timestamp columns
    (bt_json_standard.py:112-114, date cols :114)."""
    return raw.select(
        F.to_timestamp("host_timestamp", TIME_FMT).alias("host_timestamp"),
        "ip_address",
        F.to_timestamp("field_timestamp", TIME_FMT).alias("field_timestamp"),
        "reader_id",
        "dev_addr",
    )


def standardize_itmf(raw: DataFrame) -> DataFrame:
    """ITMF "matched": parse start/end times (bt_json_standard.py:116-118)."""
    return raw.select(
        "dev_addr",
        "origin_reader_id",
        "dest_reader_id",
        F.to_timestamp("start_time", TIME_FMT).alias("start_time"),
        F.to_timestamp("end_time", TIME_FMT).alias("end_time"),
        F.col("travel_time_secs").cast("int").alias("travel_time_secs"),
        F.col("speed").cast("int").alias("speed"),
        "match_validity",
        F.col("filter_id").cast("int").alias("filter_id"),
    )


def standardize_tmsr(raw: DataFrame) -> DataFrame:
    """TMSR summary: parse the 15-min-grid timestamp with the short format
    (bt_json_standard.py:121-125; sentinel -1 columns pass through,
    docs/datasrc_bt.md:342-352)."""
    return raw.select(
        "origin_reader_id",
        "dest_reader_id",
        "origin_road",
        "origin_cross_st",
        "origin_dir",
        "dest_road",
        "dest_cross_st",
        "dest_dir",
        F.col("seg_length").cast("double").alias("seg_length"),
        F.to_timestamp("timestamp", TIME_FMT_SHORT).alias("timestamp"),
        F.col("avg_travel_time").cast("int").alias("avg_travel_time"),
        F.col("avg_speed").cast("int").alias("avg_speed"),
        F.col("interval").cast("int").alias("interval"),
        F.col("samples").cast("int").alias("samples"),
        F.col("std_dev").cast("double").alias("std_dev"),
    )


def sensor_daily_obs(std_iaf: DataFrame) -> DataFrame:
    """Per-sensor perfmet observations from a standardize pass
    (bt_json_standard.py:146-157): count + min/max host timestamp per
    reader — SURVEY §2 A3."""
    return (
        std_iaf.filter(F.col("reader_id").isNotNull())
        .groupBy("reader_id")
        .agg(
            F.count("*").alias("n_obs"),
            F.min("host_timestamp").alias("min_ts"),
            F.max("host_timestamp").alias("max_ts"),
        )
    )


# ---------------------------------------------------------------------------
# ready (rawjson → ready layer; bt_ready.py:75-130)
# ---------------------------------------------------------------------------


def bt_device_id(devices: DataFrame) -> DataFrame:
    """Surrogate device_id = md5(device_type ‖ device_ip ‖ lat ‖ lon)
    (bt_ready.py:81-88 _createHash — exact concat order preserved)."""
    return devices.withColumn(
        "device_id", md5_concat("device_type", "device_ip", "lat", "lon")
    )


def ready_unmatched(std: DataFrame, devices: DataFrame) -> DataFrame:
    """J2: inner broadcast join reader_id == device_name, attach device_id,
    output ordered by (host_timestamp, reader_id) (bt_ready.py:102-108)."""
    dev = bt_device_id(devices).select("device_name", "device_id")
    return (
        std.join(F.broadcast(dev), std.reader_id == dev.device_name, "inner")
        .drop("device_name")
        .orderBy("host_timestamp", "reader_id")
    )


def ready_matched(std: DataFrame, devices: DataFrame, ts_col: str = "start_time") -> DataFrame:
    """J3: double enrichment — origin and destination reader each resolve
    to a device_id via two aliased broadcast joins (bt_ready.py:112-118).
    Ordering: (ts_col, origin_reader_id, dest_reader_id) per :119-122."""
    dev = bt_device_id(devices).select("device_name", "device_id")
    o = dev.withColumnRenamed("device_id", "origin_device_id").withColumnRenamed(
        "device_name", "_o_name"
    )
    d = dev.withColumnRenamed("device_id", "dest_device_id").withColumnRenamed(
        "device_name", "_d_name"
    )
    return (
        std.join(F.broadcast(o), std.origin_reader_id == o._o_name, "inner")
        .drop("_o_name")
        .join(F.broadcast(d), std.dest_reader_id == d._d_name, "inner")
        .drop("_d_name")
        .orderBy(ts_col, "origin_reader_id", "dest_reader_id")
    )


def prune_devices(devices_with_id: DataFrame, data: DataFrame, id_cols: list[str]) -> DataFrame:
    """J7: keep only devices referenced by the data (bt_ready.py:110-111;
    matched case unions origin+dest ids :124-126)."""
    refs = None
    for c in id_cols:
        sel = data.select(F.col(c).alias("device_id"))
        refs = sel if refs is None else refs.union(sel)
    return devices_with_id.join(refs.distinct(), "device_id", "left_semi")


# ---------------------------------------------------------------------------
# publish (ready → public/Socrata shape; bt_extract_soc.py:70-146)
# ---------------------------------------------------------------------------

SOCRATA_TIME_FMT = "yyyy-MM-dd'T'HH:mm:ss"  # publish_socrata.py:50-54


def daily_device_counter(df: DataFrame, ts_col: str, addr_col: str = "dev_addr") -> DataFrame:
    """A5: the daily-reset first-seen device counter published instead of
    the MAC (bt_extract_soc.py:73-91; docs/datasrc_bt.md:173) — see
    ``operators.windows.first_seen_rank`` for the determinism note."""
    from atd_data_lake_spark.operators.windows import first_seen_rank

    return first_seen_rank(df, addr_col, ts_col, out_col="device_address")


def publish_unmatched(ready: DataFrame, devices_with_id: DataFrame) -> DataFrame:
    """IAF publish shape (bt_extract_soc.py:126-131): Socrata-format times,
    reader name lookup (J12 as broadcast join), daily counter, record_id =
    md5(host_read_time ‖ reader_identifier ‖ device_address)."""
    dev = devices_with_id.select("device_id", "device_name")
    counted = daily_device_counter(ready, "host_timestamp")
    out = counted.join(F.broadcast(dev), "device_id").select(
        F.date_format("host_timestamp", SOCRATA_TIME_FMT).alias("host_read_time"),
        F.date_format("field_timestamp", SOCRATA_TIME_FMT).alias(
            "field_device_read_time"
        ),
        F.col("device_name").alias("reader_identifier"),
        F.col("device_address").cast("long").alias("device_address"),
    )
    return out.withColumn(
        "record_id",
        md5_concat("host_read_time", "reader_identifier", "device_address"),
    )


def publish_matched(ready: DataFrame, devices_with_id: DataFrame) -> DataFrame:
    """ITMF publish shape (bt_extract_soc.py:113-124): device names for
    origin/dest, Socrata times, day_of_week full name (arrow "dddd"),
    daily counter keyed on start_time, record_id per hashFields :124."""
    dev = devices_with_id.select("device_id", "device_name")
    o = dev.select(
        F.col("device_id").alias("origin_device_id"),
        F.col("device_name").alias("origin_reader_identifier"),
    )
    d = dev.select(
        F.col("device_id").alias("dest_device_id"),
        F.col("device_name").alias("destination_reader_identifier"),
    )
    counted = daily_device_counter(ready, "start_time")
    out = (
        counted.join(F.broadcast(o), "origin_device_id")
        .join(F.broadcast(d), "dest_device_id")
        .select(
            F.col("device_address").cast("long").alias("device_address"),
            "origin_reader_identifier",
            "destination_reader_identifier",
            F.col("travel_time_secs").alias("travel_time_seconds"),
            F.col("speed").alias("speed_miles_per_hour"),
            "match_validity",
            F.col("filter_id").alias("filter_identifier"),
            F.date_format("start_time", SOCRATA_TIME_FMT).alias("start_time"),
            F.date_format("end_time", SOCRATA_TIME_FMT).alias("end_time"),
            F.date_format("start_time", "EEEE").alias("day_of_week"),
        )
    )
    return out.withColumn(
        "record_id",
        md5_concat(
            "start_time",
            "end_time",
            "origin_reader_identifier",
            "destination_reader_identifier",
            "device_address",
        ),
    )
