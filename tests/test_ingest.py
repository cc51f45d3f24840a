"""S7/S8 ingestion-loop semantics with fake transports (no live HTTP in
this environment — the loop logic, not the wire, is the deliverable)."""

from __future__ import annotations

import io
import zipfile

import pytest

from atd_data_lake_spark.io.ingest import (
    DeviceLogSource,
    RateLimiter,
    knack_fetch_all,
    land_records,
    with_retries,
)


class FakeClock:
    def __init__(self):
        self.t = 0.0
        self.sleeps: list[float] = []

    def clock(self):
        return self.t

    def sleep(self, dt):
        self.sleeps.append(dt)
        self.t += dt


def test_rate_limiter_spaces_calls():
    fc = FakeClock()
    rl = RateLimiter(per_sec=2.0, clock=fc.clock, sleep=fc.sleep)
    for _ in range(4):
        rl.wait()
    # first call free, then 0.5s spacing
    assert fc.sleeps == [0.5, 0.5, 0.5]


def test_with_retries_backs_off_then_raises():
    attempts = []

    def flaky():
        attempts.append(1)
        raise ConnectionError("down")

    sleeps: list[float] = []
    with pytest.raises(ConnectionError):
        with_retries(flaky, retries=2, backoff_sec=1.0, sleep=sleeps.append)
    assert len(attempts) == 3 and sleeps == [1.0, 2.0]


def test_with_retries_does_not_retry_data_errors():
    attempts = []

    def bad():
        attempts.append(1)
        raise ValueError("404-ish")

    with pytest.raises(ValueError):
        with_retries(bad, sleep=lambda s: None)
    assert len(attempts) == 1


def _day_zip() -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("00-11-22-33-44-55/2019-12-01/abcd.csv", "h\n1\n")
    return buf.getvalue()


def test_device_log_source_lands_s5_zip(tmp_path):
    """The fetch loop lands <date>_<street1>_<street2>.zip ("/"→"&") that
    S5's extractor can crack (gs_log_reader.py:47-58 filename contract)."""
    payload = _day_zip()
    calls: list[str] = []

    def transport(url: str):
        calls.append(url)
        if url.endswith("counts.json"):
            return ["2019-12-01", "2019-12-02"]
        return payload

    src = DeviceLogSource(
        base_url="http://device/api/",
        street1="LAMAR/BLVD",
        street2="MANCHACA",
        transport=transport,
    )
    assert src.fetch_day("2019-12-03", str(tmp_path)) is None  # not available
    path = src.fetch_day("2019-12-01", str(tmp_path))
    assert path is not None and path.endswith("2019-12-01_LAMAR&BLVD_MANCHACA.zip")
    assert "http://device/api/counts/bydate/2019-12-01" in calls

    from atd_data_lake_spark.io.zip_extract import extract_zip_bytes

    zones = extract_zip_bytes(open(path, "rb").read())
    assert [(z.mac, z.date) for z in zones] == [("00-11-22-33-44-55", "2019-12-01")]


def test_knack_pagination_and_landing(spark):
    pages = {
        1: [{"device_name": "reader_0", "kits_id": "1"}],
        2: [{"device_name": "reader_1", "kits_id": None}],
        3: [],
    }
    fc = FakeClock()
    rl = RateLimiter(per_sec=1.0, clock=fc.clock, sleep=fc.sleep)
    rows = list(knack_fetch_all(lambda p: pages[p], limiter=rl))
    assert [r["device_name"] for r in rows] == ["reader_0", "reader_1"]
    assert len(fc.sleeps) == 2  # 3 page fetches, first is free

    df = land_records(spark, rows, "device_name string, kits_id string")
    got = {r["device_name"]: r["kits_id"] for r in df.collect()}
    assert got == {"reader_0": "1", "reader_1": None}
