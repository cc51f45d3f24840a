"""Fixture-based pipeline tests (FIXTURES.md §1-§4, §8): raw CSVs shaped
like the reference's inputs, read through the real scan path (S2 headerless
/ S3 headered), then standardize → ready → publish assertions, including
hand-computed md5 parity with the reference's _createHash semantics."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from atd_data_lake_spark.pipelines import bt, wt
from atd_data_lake_spark.schemas import BT_IAF_RAW, BT_ITMF_RAW, WT_RAW


IAF_CSV = """\
12/03/2019 12:00:00 AM,166.159.23.10,12/03/2019 12:00:12 AM,lamar_mlk,AAA=
12/03/2019 12:00:05 AM,166.159.23.11,12/03/2019 12:00:17 AM,lamar_6th,BBB=
12/03/2019 12:01:00 AM,166.159.23.10,12/03/2019 12:01:02 AM,lamar_mlk,AAA=
12/04/2019 01:00:00 AM,166.159.23.10,12/04/2019 01:00:03 AM,lamar_mlk,CCC=
12/03/2019 11:59:00 PM,166.159.23.12,12/03/2019 11:59:30 PM,ghost_reader,DDD=
"""

ITMF_CSV = """\
AAA=,lamar_mlk,lamar_6th,5/31/2019 11:48:20 PM,5/31/2019 11:59:46 PM,686,5,valid,125
BBB=,lamar_6th,lamar_mlk,5/31/2019 11:50:00 PM,5/31/2019 11:58:00 PM,480,12,invalid,125
"""

WT_CSV = """\
detID,intID,curDateTime,intName,detName,volume,occupancy,speed,status,uploadSuccess,detCountComparison,dailyCumulative
2,1,2020-09-13 00:05:00,LAMARMANCHACA,NB_in,19,0,34,Working,100,1,19
3,1,2020-09-13 00:05:00,LAMARMANCHACA,SB_out,7,1,31,Working,100,1,7
2,1,2020-09-13 00:20:00,LAMARMANCHACA,NB_in,11,0,35,Working,100,1,30
9,2,2020-09-13 00:05:00,BURNETANDERSON,EB_in,4,0,28,Working,100,1,4
5,99,2020-09-13 00:05:00,NODEVICE,WB_in,1,0,20,Working,100,1,1
"""

DEVICES = [
    # device_type, device_name, device_ip, lat, lon, kits_id
    ("BLUETOOTH", "lamar_mlk", "172.16.132.72", "30.2836018", "-97.7520752", None),
    ("BLUETOOTH", "lamar_6th", "172.16.132.73", "30.2700000", "-97.7500000", None),
    ("BLUETOOTH", "unused_reader", "172.16.132.74", "30.2600000", "-97.7400000", None),
    ("RADAR", "lamar_manchaca", "172.16.10.1", "30.2400000", "-97.7800000", 1),
    ("RADAR", "burnet_anderson", "172.16.10.2", "30.3500000", "-97.7300000", 2),
]


@pytest.fixture(scope="module")
def devices(spark):
    return spark.createDataFrame(
        DEVICES,
        "device_type string, device_name string, device_ip string, "
        "lat string, lon string, kits_id int",
    )


@pytest.fixture(scope="module")
def iaf_raw(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("bt") / "Austin_bt_12-03-2019.txt"
    p.write_text(IAF_CSV)
    # S2: headerless positional CSV scan (bt_json_standard.py:136-160)
    return spark.read.csv(str(p), schema=BT_IAF_RAW, header=False)


def test_standardize_iaf_parses_12h_times(iaf_raw):
    std = bt.standardize_iaf(iaf_raw)
    rows = {r["reader_id"]: r for r in std.collect()}
    assert str(rows["lamar_6th"]["host_timestamp"]) == "2019-12-03 00:00:05"
    # PM parse
    assert str(rows["ghost_reader"]["host_timestamp"]) == "2019-12-03 23:59:00"


def test_ready_unmatched_join_and_hash(iaf_raw, devices):
    std = bt.standardize_iaf(iaf_raw)
    ready = bt.ready_unmatched(std, devices)
    out = ready.collect()
    # ghost_reader has no device row -> inner join drops it
    assert len(out) == 4
    assert all(r["reader_id"] != "ghost_reader" for r in out)
    # device_id = md5(device_type + device_ip + lat + lon), bt_ready.py:81-88
    expect = hashlib.md5(
        b"BLUETOOTH172.16.132.7230.2836018-97.7520752"
    ).hexdigest()
    assert {r["device_id"] for r in out if r["reader_id"] == "lamar_mlk"} == {expect}
    # output ordering (host_timestamp, reader_id), bt_ready.py:108
    ts = [(r["host_timestamp"], r["reader_id"]) for r in out]
    assert ts == sorted(ts)


def test_prune_devices_semi_join(iaf_raw, devices):
    std = bt.standardize_iaf(iaf_raw)
    ready = bt.ready_unmatched(std, devices)
    pruned = bt.prune_devices(bt.bt_device_id(devices), ready, ["device_id"])
    names = {r["device_name"] for r in pruned.collect()}
    assert names == {"lamar_mlk", "lamar_6th"}  # unused_reader pruned


def test_publish_unmatched_daily_counter_resets(iaf_raw, devices):
    std = bt.standardize_iaf(iaf_raw)
    ready = bt.ready_unmatched(std, devices)
    pub = bt.publish_unmatched(ready, bt.bt_device_id(devices)).collect()
    by_time = {r["host_read_time"]: r for r in pub}
    # Dec 3: AAA= first seen 00:00:00 -> 1, BBB= 00:00:05 -> 2
    assert by_time["2019-12-03T00:00:00"]["device_address"] == 1
    assert by_time["2019-12-03T00:00:05"]["device_address"] == 2
    assert by_time["2019-12-03T00:01:00"]["device_address"] == 1  # AAA= again
    # Dec 4 resets: CCC= -> 1
    assert by_time["2019-12-04T01:00:00"]["device_address"] == 1
    # record_id = md5(host_read_time + reader_identifier + device_address)
    expect = hashlib.md5(b"2019-12-03T00:00:00lamar_mlk1").hexdigest()
    assert by_time["2019-12-03T00:00:00"]["record_id"] == expect


def test_ready_matched_double_join(spark, tmp_path_factory, devices):
    p = tmp_path_factory.mktemp("bt2") / "Austin_btmatch_05-31-2019.txt"
    p.write_text(ITMF_CSV)
    raw = spark.read.csv(str(p), schema=BT_ITMF_RAW, header=False)
    ready = bt.ready_matched(bt.standardize_itmf(raw), devices)
    out = ready.collect()
    assert len(out) == 2
    r0 = out[0]  # ordered by start_time
    assert r0["origin_reader_id"] == "lamar_mlk"
    assert r0["origin_device_id"] != r0["dest_device_id"]
    assert str(r0["start_time"]) == "2019-05-31 23:48:20"


def test_wt_chain(spark, tmp_path_factory, devices):
    p = tmp_path_factory.mktemp("wt") / "kits_2020-09-13.csv"
    p.write_text(WT_CSV)
    # S3: headered CSV scan with explicit schema (wt_json_standard.py:92-121)
    raw = spark.read.csv(
        str(p), header=True, schema=WT_RAW, timestampFormat="yyyy-MM-dd HH:mm:ss"
    )
    # standardize accepts string-typed raw too; here the scan already typed it
    std = raw
    ready = wt.ready(std, devices.filter(F.col("kits_id").isNotNull()))
    out = ready.collect()
    assert len(out) == 4  # intID=99 has no device -> dropped
    # wt hash INCLUDES device_name (wt_ready.py:77-84)
    expect = hashlib.md5(
        b"RADARlamar_manchaca172.16.10.130.2400000-97.7800000"
    ).hexdigest()
    assert {r["device_id"] for r in out if r["intID"] == 1} == {expect}

    pub = wt.publish(ready).collect()
    by_det = {(r["detid"], r["curdatetime"]): r for r in pub}
    r = by_det[(2, "2020-09-13T00:05:00")]
    assert r["direction"] == "NB"
    assert r["timebin"] == "00:00"  # round(5/15)=0
    assert r["day_of_week"] == 0  # 2020-09-13 is a Sunday
    r20 = by_det[(2, "2020-09-13T00:20:00")]
    assert r20["timebin"] == "00:15"  # round(20/15)=1
    expect_row = hashlib.md5(b"LAMARMANCHACA2020-09-13T00:05:002").hexdigest()
    assert r["row_id"] == expect_row


def test_wt_daily_cumulative_matches_source(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("wt2") / "kits.csv"
    p.write_text(WT_CSV)
    raw = spark.read.csv(
        str(p), header=True, schema=WT_RAW, timestampFormat="yyyy-MM-dd HH:mm:ss"
    )
    out = wt.daily_cumulative_volume(raw)
    rows = {(r["detID"], str(r["curDateTime"])): r for r in out.collect()}
    # engine-recomputed running sum equals the source's dailyCumulative
    for r in rows.values():
        assert r["computed_daily_cumulative"] == r["dailyCumulative"]
