"""GS chain tests (FIXTURES.md §5-§7): clock-drift correction arithmetic
against hand-computed reference semantics (gs_json_standard.py:219-267),
nested-site explode, day_covered/cross-day completion, the A1 15-min
aggregation (incl. sample-stddev and stddev-of-one → 0), and P12
publish normalization with the Python-bool record_id quirk."""

from __future__ import annotations

import hashlib
from datetime import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from atd_data_lake_spark.pipelines import gs


def test_site_time_delta(spark):
    # device clock reads 6/3/2019 2:32:13 AM at (UTC-05:00); host UTC is
    # 6/3/2019 7:34:06 AM -> device-UTC 7:32:13, delta = +113 s
    df = spark.createDataFrame(
        [("06/03/2019 07:34:06 AM", "6/3/2019 2:32:13 AM", "(UTC-05:00) Central Time (US & Canada)")],
        "host string, dev string, tz string",
    )
    out = df.select(
        gs.site_time_delta_seconds(F.col("host"), F.col("dev"), F.col("tz")).alias("d")
    ).collect()
    assert out[0]["d"] == 113


def test_v8_timestamp_adj(spark):
    # HHMMSS.f = 105452.4 on 2019-06-03, utc_offset=-300 (device thinks
    # UTC-5), timeDelta=113 s:
    # 10:54:52.4 + 300min - ... reference: ts -= timedelta(minutes=utc_offset)
    # => 10:54:52.4 + 300 min = 15:54:52.4 UTC, +113 s = 15:56:45.4
    df = spark.createDataFrame(
        [(datetime(2019, 6, 3), 105452.4, -300, 113)],
        "collection_date timestamp, timestamp double, utc_offset int, time_delta_sec long",
    )
    out = gs.standardize_v8(df).collect()
    assert str(out[0]["timestamp_adj"]) == "2019-06-03 15:56:45.400000"


def test_v4_timestamp_adj(spark):
    df = spark.createDataFrame([("20190603T105452", 113)], "ts string, d long")
    out = df.select(gs.v4_timestamp_adj(F.col("ts"), F.col("d")).alias("a")).collect()
    assert str(out[0]["a"]) == "2019-06-03 10:56:45"


def test_day_covered_flags(spark):
    df = spark.createDataFrame(
        [
            (datetime(2019, 6, 3), -300, 113),  # midnight +300min+113s -> day D+: 1
            (datetime(2019, 6, 3), 0, 0),  # exactly midnight: 0
            (datetime(2019, 6, 3), 60, -10),  # -60min-10s -> previous day: -1
        ],
        "collection_date timestamp, utc_offset int, time_delta_sec long",
    )
    out = df.select(
        gs.day_covered(
            F.col("collection_date"), F.col("utc_offset"), F.col("time_delta_sec")
        ).alias("dc")
    ).collect()
    assert [r["dc"] for r in out] == [1, 0, -1]


@pytest.fixture(scope="module")
def site(spark):
    zone = lambda zid, app, turn: Row(
        Vehicle=Row(Id=zid, ApproachType=app, TurnType=turn, IncludeInData=True)
    )
    cam = Row(
        Fisheye=Row(
            CameraMasks=Row(
                ZoneMasks=[
                    zone("z1", "Northbound", "Straight"),
                    zone("z2", "Southbound", "Left"),
                    Row(Vehicle=None),  # non-vehicle mask is skipped
                ]
            )
        )
    )
    return spark.createDataFrame(
        [Row(base="Burnet_Richcreek", site=Row(CameraDevices=[cam]))]
    )


def test_zones_from_site_explode(site):
    zones = gs.zones_from_site(site).collect()
    assert {(z["zone"], z["zone_approach"], z["turn_type"]) for z in zones} == {
        ("z1", "Northbound", "Straight"),
        ("z2", "Southbound", "Left"),
    }


def test_redash_guid(spark):
    df = spark.createDataFrame([("2c6dff02cb0c4da0adc528dd1946df40",)], "g string")
    out = df.select(gs.redash_guid(F.col("g")).alias("d")).collect()
    assert out[0]["d"] == "2c6dff02-cb0c-4da0-adc5-28dd1946df40"


def test_cross_day_completion(spark):
    mk = lambda day, h: (datetime(2019, 6, day, h), datetime(2019, 6, 3))
    day_d = spark.createDataFrame(
        [mk(3, 5), mk(4, 1)], "timestamp_adj timestamp, d timestamp"
    )  # second row spills into D+1
    aux = spark.createDataFrame(
        [mk(2, 23), mk(3, 22)], "timestamp_adj timestamp, d timestamp"
    )  # second row belongs to day D
    out = gs.cross_day_complete(day_d, aux, "d").collect()
    assert sorted(str(r["timestamp_adj"]) for r in out) == [
        "2019-06-03 05:00:00",
        "2019-06-03 22:00:00",
    ]


@pytest.fixture(scope="module")
def counts(spark):
    rows = []
    # zone z1: 3 cars in bin 10:00, speeds 10/20/30 (std=10); one 18-ft truck
    for i, speed in enumerate([10.0, 20.0, 30.0]):
        rows.append((datetime(2019, 6, 3, 10, 2, i), "z1", "S", 12.0, speed, 2.0))
    rows.append((datetime(2019, 6, 3, 10, 7, 0), "z1", "S", 18.0, 25.0, 3.0))
    # zone z2: single car in bin 10:15 -> stddev NULL -> 0.0
    rows.append((datetime(2019, 6, 3, 10, 16, 0), "z2", "L", 10.0, 35.0, 1.5))
    return spark.createDataFrame(
        rows,
        "timestamp_adj timestamp, zone string, turn string, "
        "vehicle_length double, speed double, seconds_in_zone double",
    )


@pytest.fixture(scope="module")
def movements(spark):
    return spark.createDataFrame(
        [("z1", "Northbound", "Straight"), ("z2", "Southbound", "Left")],
        "zone string, zone_approach string, turn_type string",
    )


def test_agg_interval_a1(counts, movements):
    out = gs.agg_interval(counts, movements).collect()
    by_key = {
        (str(r["timestamp"]), r["zone_approach"], r["turn"], r["heavy_vehicle"]): r
        for r in out
    }
    light = by_key[("2019-06-03 10:00:00", "Northbound", "S", 0)]
    assert light["volume"] == 3
    assert light["speed_avg"] == 20.0
    assert light["speed_std"] == 10.0  # sample stddev of 10,20,30
    heavy = by_key[("2019-06-03 10:00:00", "Northbound", "S", 1)]
    assert heavy["volume"] == 1 and heavy["speed_std"] == 0.0  # stddev-of-1 -> 0
    single = by_key[("2019-06-03 10:15:00", "Southbound", "L", 0)]
    assert single["volume"] == 1 and single["seconds_in_zone_std"] == 0.0


def test_publish_agg_p12_and_record_id(spark, counts, movements):
    agg = gs.agg_interval(counts, movements)
    device = spark.createDataFrame(
        [(72, " BURNET RD", " RICHCREEK RD")],
        "atd_device_id int, primary_st string, cross_st string",
    )
    pub = gs.publish_agg(agg, device).collect()
    r = next(p for p in pub if p["heavy_vehicle"])
    assert r["direction"] == "NORTHBOUND" and r["movement"] == "THRU"
    assert r["intersection_name"] == "BURNET RD / RICHCREEK RD"
    assert r["day_of_week"] == 1  # 2019-06-03 is a Monday
    # record_id hashes heavy_vehicle as Python str(bool) = "True"
    expect = hashlib.md5(
        b"BURNET RD / RICHCREEK RD2019-06-03T10:00:00TrueNORTHBOUNDTHRU"
    ).hexdigest()
    assert r["record_id"] == expect


def test_publish_skips_unknown_approach(spark, counts, movements):
    bad_moves = spark.createDataFrame(
        [("z1", "Sideways", "Straight"), ("z2", "Unassigned", "Left")],
        "zone string, zone_approach string, turn_type string",
    )
    agg = gs.agg_interval(counts, bad_moves)
    device = spark.createDataFrame(
        [(72, "A", "B")], "atd_device_id int, primary_st string, cross_st string"
    )
    keep = gs.publish_agg(agg, device).collect()
    assert {r["direction"] for r in keep} == {"UNASSIGNED"}  # Sideways skipped
    none_kept = gs.publish_agg(agg, device, keep_unassigned=False).collect()
    assert none_kept == []
