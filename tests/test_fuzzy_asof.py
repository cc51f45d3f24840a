"""J10 fuzzy-cascade and J8/J9 as-of operator tests against
hand-constructed reference scenarios (gs_ready.py:134-215,
support/catalog.py:123-188, support/unitdata.py:40-63)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from atd_data_lake_spark.operators.asof import asof_join
from atd_data_lake_spark.operators.fuzzy import fuzzy_device_match


@pytest.fixture(scope="module")
def devices(spark):
    rows = [
        # atd_location_id, device_ip, primary_st, cross_st, lat, lon
        ("LOC-1", "172.16.0.1", " BURNET RD", " RICHCREEK RD", "30.3500", "-97.7300"),
        ("LOC-2", "172.16.0.2", " LAMAR BLVD", " MANCHACA RD", "30.2400", "-97.7800"),
        ("LOC-3", "172.16.0.3", " CAPITAL OF TEXAS HWY", " COURTYARD DR", "30.3900", "-97.7900"),
        ("LOC-4", "172.16.0.4", " FAR AWAY ST", " NOWHERE LN", "31.0000", "-98.5000"),
    ]
    return spark.createDataFrame(
        rows,
        "atd_location_id string, device_ip string, primary_st string, "
        "cross_st string, lat string, lon string",
    )


def _sites(spark, rows):
    return spark.createDataFrame(
        rows,
        "base string, street1 string, street2 string, device_net_addr string, "
        "latitude double, longitude double",
    )


def test_stage1_exact_lookup(spark, devices):
    sites = _sites(spark, [("s1", "Burnet", "Richcreek", "10.0.0.9", 0.0, 0.0)])
    out = fuzzy_device_match(
        sites, devices, exact_lookups={"Burnet_Richcreek": "LOC-1"}
    ).collect()[0]
    assert out["atd_location_id"] == "LOC-1" and out["match_stage"] == "exact"


def test_stage2_fuzzy_and_reversed(spark, devices):
    # reversed order: site says "Manchaca / Lamar", device "LAMAR / MANCHACA"
    sites = _sites(
        spark, [("s2", "Manchaca Rd", "Lamar Blvd", "10.0.0.9", 0.0, 0.0)]
    )
    out = fuzzy_device_match(sites, devices).collect()[0]
    assert out["atd_location_id"] == "LOC-2"
    assert out["match_stage"] == "fuzzy"
    assert out["reversed"] is True
    assert out["match_ratio"] >= 0.7


def test_stage3_synonym_retry(spark, devices):
    # "Loop 360" only matches after synonym substitution (config_app.py:67-70)
    sites = _sites(
        spark, [("s3", "Loop 360", "Courtyard Dr", "10.0.0.9", 0.0, 0.0)]
    )
    no_syn = fuzzy_device_match(sites, devices).collect()[0]
    assert no_syn["match_stage"] != "fuzzy_syn"
    out = fuzzy_device_match(
        sites,
        devices,
        street_synonyms={"loop 360": "capital of texas hwy"},
    ).collect()[0]
    assert out["atd_location_id"] == "LOC-3" and out["match_stage"] == "fuzzy_syn"


def test_stage4_ip_equality(spark, devices):
    sites = _sites(spark, [("s4", "Xxxx", "Yyyy", "172.16.0.2", 0.0, 0.0)])
    out = fuzzy_device_match(sites, devices).collect()[0]
    assert out["atd_location_id"] == "LOC-2" and out["match_stage"] == "ip"


def test_stage5_gps_within_300ft(spark, devices):
    # ~0.0005 deg lat ≈ 180 ft from LOC-1; names/IP all miss
    sites = _sites(spark, [("s5", "Qq", "Ww", "10.9.9.9", 30.3505, -97.7300)])
    out = fuzzy_device_match(sites, devices).collect()[0]
    assert out["atd_location_id"] == "LOC-1" and out["match_stage"] == "gps"


def test_unmatched_yields_nulls(spark, devices):
    sites = _sites(spark, [("s6", "Qq", "Ww", "10.9.9.9", 10.0, 10.0)])
    out = fuzzy_device_match(sites, devices).collect()[0]
    assert out["atd_location_id"] is None and out["match_stage"] is None


def test_asof_backward_and_forward(spark):
    left = spark.createDataFrame(
        [("a", datetime(2019, 6, 3)), ("a", datetime(2019, 6, 7)), ("b", datetime(2019, 6, 4))],
        "base string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("a", datetime(2019, 6, 1), "v1"),
            ("a", datetime(2019, 6, 5), "v2"),
            ("b", datetime(2019, 6, 9), "v3"),
        ],
        "base string, snap_ts timestamp, val string",
    )
    back = asof_join(left, right, on=["base"], left_ts="ts", right_ts="snap_ts",
                     direction="backward")
    got = {(r["base"], r["ts"].day): r["val"] for r in back.collect()}
    # latest snapshot ≤ ts (support/catalog.py:123-188)
    assert got == {("a", 3): "v1", ("a", 7): "v2", ("b", 4): None}

    fwd = asof_join(left, right, on=["base"], left_ts="ts", right_ts="snap_ts",
                    direction="forward")
    got_f = {(r["base"], r["ts"].day): r["val"] for r in fwd.collect()}
    # closest future snapshot (support/unitdata.py:40-63)
    assert got_f == {("a", 3): "v2", ("a", 7): None, ("b", 4): "v3"}


def test_asof_nearest_tiebreaks_backward(spark):
    """Equal distances break to the EARLIER right row (backward
    preference), matching the documented total order."""
    import datetime as dt

    from atd_data_lake_spark.operators.asof import asof_join
    from pyspark.sql import functions as F

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [("a", t0)], "k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            ("a", t0 - dt.timedelta(seconds=30), "before"),
            ("a", t0 + dt.timedelta(seconds=30), "after"),  # same distance
            ("a", t0 + dt.timedelta(seconds=10), "closest"),
        ],
        "k string, rts timestamp, tag string",
    )
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        direction="nearest", how="inner",
    )
    assert [r["tag"] for r in out.collect()] == ["closest"]

    # remove the closest → tie between ±30s → earlier wins
    out2 = asof_join(
        left,
        right.filter(F.col("tag") != "closest"),
        on=["k"], left_ts="ts", right_ts="rts",
        direction="nearest", how="inner",
    )
    assert [r["tag"] for r in out2.collect()] == ["before"]

    # tolerance excludes everything → inner drops, left keeps with NULLs
    out3 = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        direction="nearest", how="inner",
        tolerance=F.expr("INTERVAL 5 SECONDS"),
    )
    assert out3.count() == 0
