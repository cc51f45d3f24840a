"""GS end-to-end integration: day ZIP → extraction (S5) → per-zone CSV
scan with the v8 schema (S6) → clock-drift standardize → movements join +
15-min aggregation (A1) → publish (P12) — the whole gs chain over real
files, verified against hand-computed values."""

from __future__ import annotations

import zipfile
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from atd_data_lake_spark.io.zip_extract import extract_to_dir
from atd_data_lake_spark.pipelines import gs
from atd_data_lake_spark.schemas import GS_V8

# v8 rows: count_version, site_version, HHMMSS.f, utc_offset, turn,
# vehicle_length, speed, light_state, seconds_in_zone, vehicles_in_zone,
# light_state_sec, sec_since_green, freeflow, freeflow_cal
ZONE1 = """\
8,23,100001.0,-300,S,12,10,G,2.0,1,5.0,0.0,22,23
8,23,100101.0,-300,S,12,20,G,3.0,1,5.0,0.0,22,23
8,23,100201.0,-300,S,12,30,G,4.0,1,5.0,0.0,22,23
"""
ZONE2 = """\
8,23,101601.0,-300,L,18,25,R,1.5,1,5.0,0.0,22,23
"""


@pytest.fixture(scope="module")
def extracted(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("gs_e2e")
    zp = root / "day.zip"
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("00-0A-0B-0C-0D-0E/2019-06-03/aaaa1111.csv", ZONE1)
        zf.writestr("00-0A-0B-0C-0D-0E/2019-06-03/bbbb2222.csv", ZONE2)
    out = root / "landing"
    extract_to_dir(str(zp), str(out))
    return out


def test_full_chain(spark, extracted):
    # S6: per-zone scan, zone GUID from the filename
    raw = (
        spark.read.csv(f"{extracted}/*/*/*.csv", schema=GS_V8)
        .withColumn(
            "zone",
            F.regexp_extract(F.input_file_name(), r"/([0-9a-f]+)\.csv$", 1),
        )
        .withColumn("collection_date", F.lit("2019-06-03").cast("timestamp"))
        .withColumn("time_delta_sec", F.lit(113).cast("long"))
    )
    assert raw.count() == 4
    assert set(r["zone"] for r in raw.select("zone").distinct().collect()) == {
        "aaaa1111",
        "bbbb2222",
    }

    # standardize: clock-drift-corrected timestamp_adj
    std = gs.standardize_v8(raw)
    first = std.filter(F.col("zone") == "aaaa1111").orderBy("timestamp_adj").collect()[0]
    # 10:00:01 + 300 min + 113 s = 15:01:54
    assert str(first["timestamp_adj"]) == "2019-06-03 15:01:54"

    # ready+agg: movements join + 15-min windows
    movements = spark.createDataFrame(
        [("aaaa1111", "Northbound", "Straight"), ("bbbb2222", "Southbound", "Left")],
        "zone string, zone_approach string, turn_type string",
    )
    agg = gs.agg_interval(std, movements)
    rows = {
        (str(r["timestamp"]), r["zone_approach"]): r for r in agg.collect()
    }
    nb = rows[("2019-06-03 15:00:00", "Northbound")]
    assert nb["volume"] == 3 and nb["speed_avg"] == 20.0 and nb["speed_std"] == 10.0
    sb = rows[("2019-06-03 15:15:00", "Southbound")]
    assert sb["volume"] == 1 and sb["heavy_vehicle"] == 1

    # publish
    device = spark.createDataFrame(
        [(72, " BURNET RD", " RICHCREEK RD")],
        "atd_device_id int, primary_st string, cross_st string",
    )
    pub = gs.publish_agg(agg, device).collect()
    assert {p["direction"] for p in pub} == {"NORTHBOUND", "SOUTHBOUND"}
    assert {p["movement"] for p in pub} == {"THRU", "LEFT TURN"}
    assert all(len(p["record_id"]) == 32 for p in pub)
