"""Perfmet — ETL performance metrics (S15, docs/appendix_perfmet.md:19-70).

Two small tables: ``etl_perfmet_job`` (one row per data_source × stage ×
run: seconds, records, collection range) and ``etl_perfmet_obs`` (per
sensor per day: observed value, expected = trailing 7-day mean,
timestamp range).  The reference upserts them over PostgREST
(drivers/perfmet_postgrest.py:30-41,68-92); here they are DataFrames
MERGEd like the catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from atd_data_lake_spark.operators.windows import latest_per_group, trailing_avg

JOB_SCHEMA = T.StructType(
    [
        T.StructField("data_source", T.StringType()),
        T.StructField("stage", T.StringType()),
        T.StructField("seconds", T.DoubleType()),
        T.StructField("records", T.LongType()),
        T.StructField("processing_date", T.TimestampType()),
        T.StructField("collection_start", T.TimestampType()),
        T.StructField("collection_end", T.TimestampType()),
    ]
)

OBS_SCHEMA = T.StructType(
    [
        T.StructField("data_source", T.StringType()),
        T.StructField("sensor_name", T.StringType()),
        T.StructField("data_type", T.StringType()),
        T.StructField("data", T.DoubleType()),
        T.StructField("expected", T.DoubleType()),
        T.StructField("collection_date", T.TimestampType()),
        T.StructField("timestamp_min", T.TimestampType()),
        T.StructField("timestamp_max", T.TimestampType()),
    ]
)


def job_row(
    obs: DataFrame,
    data_source: str,
    stage: str,
    seconds: float,
    ts_col: str = "min_ts",
    end_col: str = "max_ts",
    records_col: str = "n_obs",
) -> DataFrame:
    """A4: collapse a sensor-obs frame to the job row — record total +
    min/max collection range (support/perfmet.py:31-50)."""
    return obs.agg(
        F.lit(data_source).alias("data_source"),
        F.lit(stage).alias("stage"),
        F.lit(float(seconds)).alias("seconds"),
        F.sum(records_col).cast("long").alias("records"),
        F.current_timestamp().alias("processing_date"),
        F.min(ts_col).alias("collection_start"),
        F.max(end_col).alias("collection_end"),
    )


def with_expected(obs: DataFrame, sample_days: int = 7) -> DataFrame:
    """A6: expected = trailing ``sample_days`` mean of each sensor's
    observations (util/perfmet_knack.py:21,114-158) — a range-frame
    window, NOT a per-sensor driver loop."""
    return trailing_avg(
        obs,
        entity_col="sensor_name",
        day_col="collection_date",
        value_col="data",
        n_days=sample_days,
        out_col="expected",
    )


def latest_obs(obs: DataFrame) -> DataFrame:
    """A7: latest observation per (sensor, data_type)
    (perfmet_knack.py:141-142 groupby tail(1))."""
    return latest_per_group(
        obs, ["sensor_name", "data_type"], order_col="collection_date"
    )


def missing_data_sentinel(obs: DataFrame, all_sensors: DataFrame) -> DataFrame:
    """The −1 "no data today" convention (util/perfmet_knack.py:148-152):
    sensors present in the dimension but absent from today's obs get a
    −1 data row so dashboards distinguish 'dead' from 'zero'."""
    missing = all_sensors.join(
        obs.select("sensor_name").distinct(), "sensor_name", "left_anti"
    )
    return missing.select(
        F.lit(None).cast("string").alias("data_source"),
        "sensor_name",
        F.lit("missing").alias("data_type"),
        F.lit(-1.0).alias("data"),
        F.lit(None).cast("double").alias("expected"),
        F.lit(None).cast("timestamp").alias("collection_date"),
        F.lit(None).cast("timestamp").alias("timestamp_min"),
        F.lit(None).cast("timestamp").alias("timestamp_max"),
    )
