"""Unit data — the slowly-changing device dimension (SURVEY §1.1.4).

The reference snapshots the Knack device inventory daily and resolves
"which snapshot applies to day D" with a forward as-of lookup: the
closest FUTURE unit-data file ≥ D+1s, falling back to the latest when
no preparation ran (support/unitdata.py:40-63; docs/datasrc_wt.md:58).

Spark-first: snapshots are one dimension table keyed
(snapshot_date, device); resolution is one as-of join of the day's
processing dates against the snapshot dates — every day in a backfill
resolves in the same plan instead of a per-day catalog search.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from atd_data_lake_spark.operators.asof import asof_join

# Knack field → canonical renames (P1, unitdata_knack_common.py:13-27)
TS_RENAME = {
    "Device type": "device_type",
    "ATD device ID": "atd_device_id",
    "Device name": "device_name",
    "Device status": "device_status",
    "Device IP": "device_ip",
    "IP comm status": "ip_comm_status",
    "ATD location ID": "atd_location_id",
    "COA intersection ID": "coa_intersection_id",
    "Lat": "lat",
    "Lon": "lon",
    "Primary street": "primary_st",
    "Primary street segment ID": "primary_st_segment_id",
    "Cross street": "cross_st",
    "Cross street segment ID": "cross_st_segment_id",
}


def canonicalize(knack_raw: DataFrame, rename: dict[str, str] | None = None) -> DataFrame:
    """P1+P3 over a raw Knack extract: bulk rename, trim strings,
    null-safe coercions (unitdata_knack_common.py:90-99,129-154)."""
    rename = rename or TS_RENAME
    out = knack_raw.withColumnsRenamed(
        {k: v for k, v in rename.items() if k in knack_raw.columns}
    )
    for c, dtype in out.dtypes:
        if dtype == "string":
            t = F.trim(F.col(c))
            out = out.withColumn(
                c, F.when((t == "") | (F.lower(t) == "nan"), None).otherwise(t)
            )
    return out


def resolve_snapshots(
    days: DataFrame,
    snapshots: DataFrame,
    day_col: str = "collection_date",
    snap_col: str = "snapshot_date",
) -> DataFrame:
    """J9: attach to each processing day its governing snapshot date —
    the closest snapshot strictly AFTER the day (date + 1s lower bound,
    support/unitdata.py:51-52), falling back to the latest snapshot when
    none is later (the reference's no-prepare fallback :46-48)."""
    snap_dates = snapshots.select(snap_col).distinct()
    # the reference's strictly-after bound is "date + 1 second" (:51-52)
    shifted = days.withColumn(
        "_day_plus", F.col(day_col) + F.expr("INTERVAL 1 SECOND")
    )
    fwd = asof_join(
        shifted,
        snap_dates.withColumn("_next_snap", F.col(snap_col)).drop(snap_col),
        on=[],
        left_ts="_day_plus",
        right_ts="_next_snap",
        direction="forward",
    ).drop("_day_plus")
    latest = snap_dates.agg(F.max(snap_col).alias("_latest_snap"))
    return fwd.crossJoin(F.broadcast(latest)).withColumn(
        "resolved_snapshot", F.coalesce("_next_snap", "_latest_snap")
    ).drop("_next_snap", "_latest_snap")


def devices_for_day(
    days: DataFrame,
    snapshots: DataFrame,
    day_col: str = "collection_date",
    snap_col: str = "snapshot_date",
) -> DataFrame:
    """Join the resolved snapshot back to the full dimension: one row per
    (day, device) carrying that day's governing device attributes."""
    resolved = resolve_snapshots(days, snapshots, day_col, snap_col)
    return resolved.join(
        snapshots,
        resolved.resolved_snapshot == snapshots[snap_col],
        "inner",
    ).drop(snap_col)
