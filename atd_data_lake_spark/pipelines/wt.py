"""Wavetronix (wt) pipeline: KITS CSV → standardized → ready → published.

Re-expresses wt_json_standard.py → wt_ready.py → wt_extract_soc.py.
The simplest reference source; exercises the whole architecture
(SURVEY.md §7.2 step 2).  One real query answered end-to-end: radar
volume/occupancy/speed per detector per 15-min bin for a date range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from atd_data_lake_spark.functions.datetime_fns import day_of_week_ref, timebin_15min
from atd_data_lake_spark.functions.ids import md5_concat

KITS_TIME_FMT = "yyyy-MM-dd HH:mm:ss"  # wt_json_standard.py:102
SOCRATA_TIME_FMT = "yyyy-MM-dd'T'HH:mm:ss"


def standardize(raw: DataFrame) -> DataFrame:
    """Direct CSV→canonical translation with int coercions and timestamp
    parse (wt_json_standard.py:92-121)."""
    return raw.select(
        F.col("detID").cast("int").alias("detID"),
        F.col("intID").cast("int").alias("intID"),
        F.to_timestamp("curDateTime", KITS_TIME_FMT).alias("curDateTime"),
        "intName",
        "detName",
        F.col("volume").cast("int").alias("volume"),
        F.col("occupancy").cast("int").alias("occupancy"),
        F.col("speed").cast("int").alias("speed"),
        "status",
        F.col("uploadSuccess").cast("int").alias("uploadSuccess"),
        F.col("detCountComparison").cast("int").alias("detCountComparison"),
        F.col("dailyCumulative").cast("int").alias("dailyCumulative"),
    )


def sensor_daily_obs(std: DataFrame) -> DataFrame:
    """Per-intersection perfmet obs: volume sum + min/max timestamp
    (wt_json_standard.py:111-121) — SURVEY §2 A3 (sum variant)."""
    return (
        std.filter(F.col("intName").isNotNull())
        .groupBy("intName")
        .agg(
            F.sum("volume").alias("volume"),
            F.min("curDateTime").alias("min_ts"),
            F.max("curDateTime").alias("max_ts"),
        )
    )


def wt_device_id(devices: DataFrame) -> DataFrame:
    """Surrogate device_id = md5(device_type ‖ device_name ‖ device_ip ‖
    lat ‖ lon) (wt_ready.py:77-84 — note the wt hash INCLUDES device_name,
    unlike bt's)."""
    return devices.withColumn(
        "device_id",
        md5_concat("device_type", "device_name", "device_ip", "lat", "lon"),
    )


def ready(std: DataFrame, devices: DataFrame) -> DataFrame:
    """J4: inner broadcast join intID == kits_id attaching device_id;
    output ordered by (curDateTime, detID) (wt_ready.py:99-103)."""
    dev = wt_device_id(devices).select("kits_id", "device_id")
    return (
        std.join(F.broadcast(dev), std.intID == dev.kits_id, "inner")
        .drop("kits_id")
        .orderBy("curDateTime", "detID")
    )


def daily_cumulative_volume(std: DataFrame) -> DataFrame:
    """Reproduce the source system's precomputed dailyCumulative
    (docs/datasrc_wt.md:15-21; SURVEY §2.5): running per-day volume sum
    per detector, ordered by timestamp."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("detID", F.to_date("curDateTime"))
        .orderBy("curDateTime")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return std.withColumn("computed_daily_cumulative", F.sum("volume").over(w))


def publish(ready_df: DataFrame) -> DataFrame:
    """Socrata publish shape (wt_extract_soc.py:59-88): date parts,
    reference day_of_week = (weekday()+1)%7, 15-min timebin (round-to-
    nearest quirk preserved in timebin_15min), direction = detName prefix
    (P14), row_id = md5(intname ‖ curdatetime ‖ detid)."""
    ts = F.col("curDateTime")
    out = ready_df.select(
        F.col("detID").alias("detid"),
        F.col("intID").alias("int_id"),
        F.date_format(ts, SOCRATA_TIME_FMT).alias("curdatetime"),
        F.col("intName").alias("intname"),
        F.col("detName").alias("detname"),
        "volume",
        "occupancy",
        "speed",
        F.month(ts).alias("month"),
        F.dayofmonth(ts).alias("day"),
        F.year(ts).alias("year"),
        F.hour(ts).alias("hour"),
        F.minute(ts).alias("minute"),
        day_of_week_ref(ts).alias("day_of_week"),
        timebin_15min(ts).alias("timebin"),
        F.split(F.col("detName"), "_").getItem(0).alias("direction"),
    )
    return out.withColumn("row_id", md5_concat("intname", "curdatetime", "detid"))
