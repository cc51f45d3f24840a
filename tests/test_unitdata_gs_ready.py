"""Unit-data as-of resolution (J9 in pipeline context) and the GS ready
composition (configured-zone semi-join + day completion)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from atd_data_lake_spark.pipelines import gs, unitdata


@pytest.fixture(scope="module")
def snapshots(spark):
    rows = []
    for snap_day, status in [(2, "TURNED_ON"), (5, "REMOVED")]:
        rows.append(
            (datetime(2019, 6, snap_day), "lamar_mlk", status)
        )
    return spark.createDataFrame(
        rows, "snapshot_date timestamp, device_name string, device_status string"
    )


def test_resolve_snapshots_forward_with_fallback(spark, snapshots):
    days = spark.createDataFrame(
        [(datetime(2019, 6, d),) for d in (1, 2, 4, 7)], "collection_date timestamp"
    )
    out = {
        r["collection_date"].day: r["resolved_snapshot"].day
        for r in unitdata.resolve_snapshots(days, snapshots).collect()
    }
    # day 1 -> next snapshot Jun 2; day 2 -> strictly-after rule picks Jun 5
    # (date+1s, support/unitdata.py:51-52); day 4 -> Jun 5;
    # day 7 -> none later -> latest (Jun 5) fallback
    assert out == {1: 2, 2: 5, 4: 5, 7: 5}


def test_devices_for_day_attributes(spark, snapshots):
    days = spark.createDataFrame(
        [(datetime(2019, 6, 1),), (datetime(2019, 6, 4),)],
        "collection_date timestamp",
    )
    out = {
        (r["collection_date"].day, r["device_name"]): r["device_status"]
        for r in unitdata.devices_for_day(days, snapshots).collect()
    }
    assert out[(1, "lamar_mlk")] == "TURNED_ON"  # governed by Jun 2 snapshot
    assert out[(4, "lamar_mlk")] == "REMOVED"  # governed by Jun 5 snapshot


def test_canonicalize_rename_and_coercion(spark):
    raw = spark.createDataFrame(
        [("  lamar_mlk ", "nan", "BLUETOOTH")],
        ["Device name", "Lat", "Device type"],
    )
    out = unitdata.canonicalize(raw).collect()[0]
    assert out["device_name"] == "lamar_mlk"  # trimmed
    assert out["lat"] is None  # 'nan' -> NULL
    assert out["device_type"] == "BLUETOOTH"


@pytest.fixture(scope="module")
def site(spark):
    zone = lambda zid, inc: Row(
        Vehicle=Row(Id=zid, ApproachType="Northbound", TurnType="Straight",
                    IncludeInData=inc)
    )
    cam_on = Row(
        Fisheye=Row(
            IsConfigured=True,
            CameraMasks=Row(ZoneMasks=[zone("a" * 32, True), zone("b" * 32, False)]),
        )
    )
    cam_off = Row(
        Fisheye=Row(
            IsConfigured=False,
            CameraMasks=Row(ZoneMasks=[zone("c" * 32, True)]),
        )
    )
    return spark.createDataFrame(
        [Row(base="X", site=Row(CameraDevices=[cam_on, cam_off]))]
    )


def test_configured_zones_filters(site):
    zones = gs.configured_zones(site).collect()
    # IncludeInData=False zone and unconfigured camera's zone both dropped
    assert [z["zone"] for z in zones] == ["a" * 32]
    assert zones[0]["zone_guid_dashed"] == (
        "aaaaaaaa-aaaa-aaaa-aaaa-aaaaaaaaaaaa"
    )


def test_ready_counts_composition(spark, site):
    mk = lambda zone, day, h: (zone, datetime(2019, 6, day, h), datetime(2019, 6, 3))
    std = spark.createDataFrame(
        [
            mk("a" * 32, 3, 5),   # kept
            mk("a" * 32, 4, 1),   # spills out of day window -> dropped
            mk("b" * 32, 3, 6),   # excluded zone -> dropped
            mk("a" * 32, 2, 23),  # D-1 spill, outside window -> dropped
        ],
        "zone string, timestamp_adj timestamp, collection_date timestamp",
    )
    out = gs.ready_counts(std, site)
    rows = out.collect()
    assert len(rows) == 1
    assert str(rows[0]["timestamp_adj"]) == "2019-06-03 05:00:00"
