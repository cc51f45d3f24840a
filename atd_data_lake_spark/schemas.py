"""Explicit StructTypes for every reference file type.

The reference declares schemas as Python column lists per file type
(bt_json_standard.py:110-125, wt_json_standard.py:98-109,
gs_json_standard.py:133-154); this module is the direct Spark analog
(SURVEY.md §1.3).  All timestamps land as TimestampType; raw string
formats are parsed by the pipelines with explicit format strings.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Bluetooth (bt) — three daily headerless CSVs (docs/datasrc_bt.md)
# ---------------------------------------------------------------------------

# "unmatched" IAF — bt_json_standard.py:112-114
BT_IAF_RAW = T.StructType(
    [
        T.StructField("host_timestamp", T.StringType()),
        T.StructField("ip_address", T.StringType()),
        T.StructField("field_timestamp", T.StringType()),
        T.StructField("reader_id", T.StringType()),
        T.StructField("dev_addr", T.StringType()),
    ]
)

# "matched" ITMF — bt_json_standard.py:116-118
BT_ITMF_RAW = T.StructType(
    [
        T.StructField("dev_addr", T.StringType()),
        T.StructField("origin_reader_id", T.StringType()),
        T.StructField("dest_reader_id", T.StringType()),
        T.StructField("start_time", T.StringType()),
        T.StructField("end_time", T.StringType()),
        T.StructField("travel_time_secs", T.IntegerType()),
        T.StructField("speed", T.IntegerType()),
        T.StructField("match_validity", T.StringType()),
        T.StructField("filter_id", T.IntegerType()),
    ]
)

# "traf_match_summary" TMSR — bt_json_standard.py:121-125
BT_TMSR_RAW = T.StructType(
    [
        T.StructField("origin_reader_id", T.StringType()),
        T.StructField("dest_reader_id", T.StringType()),
        T.StructField("origin_road", T.StringType()),
        T.StructField("origin_cross_st", T.StringType()),
        T.StructField("origin_dir", T.StringType()),
        T.StructField("dest_road", T.StringType()),
        T.StructField("dest_cross_st", T.StringType()),
        T.StructField("dest_dir", T.StringType()),
        T.StructField("seg_length", T.DoubleType()),
        T.StructField("timestamp", T.StringType()),
        T.StructField("avg_travel_time", T.IntegerType()),
        T.StructField("avg_speed", T.IntegerType()),
        T.StructField("interval", T.IntegerType()),
        T.StructField("samples", T.IntegerType()),
        T.StructField("std_dev", T.DoubleType()),
    ]
)

# Raw timestamp formats (bt_json_standard.py:90-104): IAF/ITMF carry
# seconds + AM/PM; TMSR has no seconds.
BT_TS_FORMAT = "M/d/yyyy h:mm:ss a"
BT_TMSR_TS_FORMAT = "M/d/yyyy h:mm a"

# ---------------------------------------------------------------------------
# Wavetronix (wt) — headered CSV from the KITS MSSQL join
# (wt_insert_lake.py:62-63; types wt_json_standard.py:98-109)
# ---------------------------------------------------------------------------

WT_RAW = T.StructType(
    [
        T.StructField("detID", T.IntegerType()),
        T.StructField("intID", T.IntegerType()),
        T.StructField("curDateTime", T.TimestampType()),
        T.StructField("intName", T.StringType()),
        T.StructField("detName", T.StringType()),
        T.StructField("volume", T.IntegerType()),
        T.StructField("occupancy", T.IntegerType()),
        T.StructField("speed", T.IntegerType()),
        T.StructField("status", T.StringType()),
        T.StructField("uploadSuccess", T.IntegerType()),
        T.StructField("detCountComparison", T.IntegerType()),
        T.StructField("dailyCumulative", T.IntegerType()),
    ]
)

# ---------------------------------------------------------------------------
# GRIDSMART (gs) — headerless per-zone CSV, schema by count_version
# (gs_json_standard.py:133-154; docs/datasrc_gs.md:16-57)
# ---------------------------------------------------------------------------

GS_V8 = T.StructType(
    [
        T.StructField("count_version", T.IntegerType()),
        T.StructField("site_version", T.IntegerType()),
        T.StructField("timestamp", T.DoubleType()),  # HHMMSS.f within the day
        T.StructField("utc_offset", T.IntegerType()),  # minutes
        T.StructField("turn", T.StringType()),
        T.StructField("vehicle_length", T.DoubleType()),
        T.StructField("speed", T.DoubleType()),
        T.StructField("light_state", T.StringType()),
        T.StructField("seconds_in_zone", T.DoubleType()),
        T.StructField("vehicles_in_zone", T.DoubleType()),
        T.StructField("light_state_sec", T.DoubleType()),
        T.StructField("sec_since_green", T.DoubleType()),
        T.StructField("zone_freeflow_speed", T.DoubleType()),
        T.StructField("zone_freeflow_speed_cal", T.DoubleType()),
    ]
)

GS_V4 = T.StructType(
    [
        T.StructField("count_version", T.IntegerType()),
        T.StructField("site_version", T.IntegerType()),
        T.StructField("timestamp", T.StringType()),  # %Y%m%dT%H%M%S[.f]
        T.StructField("internal_veh_id", T.StringType()),
        T.StructField("internal_veh_type", T.StringType()),
        T.StructField("vehicle_length", T.DoubleType()),
        T.StructField("speed", T.DoubleType()),
        T.StructField("turn", T.StringType()),
        T.StructField("allowable_turns", T.StringType()),
        T.StructField("seconds_in_zone", T.DoubleType()),
        T.StructField("seconds_since_last_exit", T.DoubleType()),
        T.StructField("queue_length", T.DoubleType()),
        T.StructField("light_state_on_exit", T.StringType()),
        T.StructField("sec_since_green", T.DoubleType()),
        T.StructField("internal_frame_count", T.IntegerType()),
        T.StructField("day_night", T.StringType()),
    ]
)

#: count_version → schema dispatch (gs_json_standard.py:125-131); v7 shares
#: the v8 shape in the reference's docs but its time correction was never
#: implemented there (gs_json_standard.py:234-235).
GS_SCHEMAS = {8: GS_V8, 7: GS_V8, 4: GS_V4}

# GS site file — flattened one-row-per-zone dimension (SURVEY.md §1.1.5;
# nested source docs/datasrc_gs.md:72-148, flattening via explode()).
GS_SITE_ZONES = T.StructType(
    [
        T.StructField("base", T.StringType()),  # intersection id street1_street2
        T.StructField("street1", T.StringType()),
        T.StructField("street2", T.StringType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
        T.StructField("device_net_addr", T.StringType()),
        T.StructField("zone_guid", T.StringType()),  # 32-hex, undashed
        T.StructField("approach_type", T.StringType()),
        T.StructField("turn_type", T.StringType()),
        T.StructField("include_in_data", T.BooleanType()),
        T.StructField("is_configured", T.BooleanType()),
        T.StructField("device_datetime", T.StringType()),
        T.StructField("host_time_utc", T.StringType()),
    ]
)

# ---------------------------------------------------------------------------
# Unit data — Knack device dimension, daily snapshot
# (unitdata_knack_common.py:92-99; docs/datasrc_bt.md:75-99)
# ---------------------------------------------------------------------------

UNIT_DATA = T.StructType(
    [
        T.StructField("device_type", T.StringType()),
        T.StructField("atd_device_id", T.IntegerType()),
        T.StructField("device_name", T.StringType()),
        T.StructField("device_status", T.StringType()),
        T.StructField("device_ip", T.StringType()),
        T.StructField("ip_comm_status", T.StringType()),
        T.StructField("atd_location_id", T.StringType()),
        T.StructField("coa_intersection_id", T.LongType()),
        T.StructField("lat", T.StringType()),  # decimal-as-string in reference
        T.StructField("lon", T.StringType()),
        T.StructField("primary_st", T.StringType()),
        T.StructField("primary_st_segment_id", T.StringType()),
        T.StructField("cross_st", T.StringType()),
        T.StructField("cross_st_segment_id", T.StringType()),
        T.StructField("kits_id", T.IntegerType()),  # wt only
        T.StructField("snapshot_date", T.DateType()),
    ]
)

# ---------------------------------------------------------------------------
# Catalog — docs/appendix_catalog.md:77-99; PK semantics
# docs/tech_architecture.md:121-153.
# ---------------------------------------------------------------------------

CATALOG = T.StructType(
    [
        T.StructField("repository", T.StringType(), False),
        T.StructField("data_source", T.StringType(), False),
        T.StructField("id_base", T.StringType(), False),
        T.StructField("id_ext", T.StringType(), False),
        T.StructField("pointer", T.StringType()),
        T.StructField("collection_date", T.TimestampType(), False),
        T.StructField("collection_end", T.TimestampType()),  # NULL ⇒ +1 day
        T.StructField("processing_date", T.TimestampType()),
        T.StructField("metadata", T.StringType()),  # JSON string (jsonb analog)
    ]
)

#: catalog primary key (docs/appendix_catalog.md:94-99)
CATALOG_PK = ["collection_date", "repository", "data_source", "id_base", "id_ext"]

# ---------------------------------------------------------------------------
# Perfmet — docs/appendix_perfmet.md:19-70
# ---------------------------------------------------------------------------

PERFMET_JOB = T.StructType(
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

PERFMET_OBS = T.StructType(
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
