"""S7/S8 — driver-side ingestion loops for the device-HTTP and Knack
API sources.

SURVEY §2 scopes these OUTSIDE Spark: they are sequential, rate-limited
HTTP fetch loops whose only job is to land raw payloads where the Spark
sources (S1/S5/S6 scans) pick them up.  What IS engine-relevant is the
landing contract and the loop's retry/pagination/rate-limit semantics,
so both are implemented here with an *injectable transport* — a plain
``Callable`` standing in for ``requests.get`` / the Knack client (absent
in this environment, and deliberately not imported: transports are
environment wiring, not engine code).

- ``DeviceLogSource`` mirrors the GRIDSMART log reader
  (drivers/devices/gs_log_reader.py:27-92): ``counts.json`` lists the
  available dates; a per-date counts ZIP downloads to
  ``<date>_<street1>_<street2>.zip`` ("/" → "&"), which S5
  (``zip_extract``) then cracks into per-zone CSVs.
- ``KnackSource`` mirrors the unit-data pull
  (drivers/devices/unitdata_knack_common.py:50-110): paginated record
  fetch, optional filter dict, landing via ``spark.createDataFrame``.
- ``RateLimiter``/``with_retries`` carry the loop semantics every
  polite API consumer needs; clock and sleep are injectable so tests
  run instantly.

At 100 TB these loops never become the bottleneck: they move file
*pointers* and small unit-data tables; bulk payload processing happens
in the distributed S5/S6 scans.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field


class RateLimiter:
    """Token-per-interval limiter: at most ``per_sec`` calls per second,
    enforced by sleeping the *remainder* of the interval (not a fixed
    sleep, so slow responses don't double-pay)."""

    def __init__(
        self,
        per_sec: float,
        clock: Callable[[], float] = time.monotonic,
        sleep: Callable[[float], None] = time.sleep,
    ) -> None:
        self.interval = 1.0 / per_sec
        self.clock = clock
        self.sleep = sleep
        self._next_ok = 0.0

    def wait(self) -> None:
        now = self.clock()
        if now < self._next_ok:
            self.sleep(self._next_ok - now)
            now = self._next_ok
        self._next_ok = now + self.interval


def with_retries(
    call: Callable[[], object],
    retries: int = 3,
    backoff_sec: float = 1.0,
    transient: type[Exception] | tuple = (ConnectionError, TimeoutError),
    sleep: Callable[[float], None] = time.sleep,
):
    """Run ``call`` with exponential backoff on transient errors only —
    a 404/parse error is data, not weather, and surfaces immediately."""
    for attempt in range(retries + 1):
        try:
            return call()
        except transient:
            if attempt == retries:
                raise
            sleep(backoff_sec * (2**attempt))


@dataclass
class DeviceLogSource:
    """S7: one GRIDSMART device's log endpoint (gs_log_reader.py:27-92).

    ``transport(url) -> bytes | list`` is the injected HTTP GET:
    ``<base_url>counts.json`` must yield a list of 'YYYY-MM-DD' strings,
    ``<base_url>counts/bydate/<date>`` the day-ZIP bytes.
    """

    base_url: str
    street1: str
    street2: str
    transport: Callable[[str], object]
    limiter: RateLimiter | None = None
    avail: set[str] = field(default_factory=set)

    def __post_init__(self) -> None:
        dates = with_retries(lambda: self.transport(self.base_url + "counts.json"))
        self.avail = set(dates)  # type: ignore[arg-type]

    def filename(self, date: str) -> str:
        base = f"{self.street1}_{self.street2}".replace("/", "&")
        return f"{date}_{base}.zip"

    def fetch_day(self, date: str, dest_dir: str) -> str | None:
        """Download one day's counts ZIP into the S5 landing dir; None if
        the device has no counts for that date (gs_log_reader.py:60-92)."""
        if date not in self.avail:
            return None
        if self.limiter is not None:
            self.limiter.wait()
        payload = with_retries(
            lambda: self.transport(f"{self.base_url}counts/bydate/{date}")
        )
        path = os.path.join(dest_dir, self.filename(date))
        with open(path, "wb") as f:
            f.write(payload)  # type: ignore[arg-type]
        return path


def knack_fetch_all(
    fetch_page: Callable[[int], list[dict]],
    limiter: RateLimiter | None = None,
    max_pages: int = 10_000,
) -> Iterator[dict]:
    """S8 pagination loop: pull pages until an empty one.  ``fetch_page``
    is the injected client (knackpy's App.get in production); the Knack
    filter dict (unitdata_knack_common.py:74-79) belongs inside it."""
    for page in range(1, max_pages + 1):
        if limiter is not None:
            limiter.wait()
        rows = with_retries(lambda: fetch_page(page))
        if not rows:
            return
        yield from rows  # type: ignore[misc]


def land_records(spark, rows: list[dict], schema: str):
    """Land fetched unit-data records as a DataFrame with an explicit
    schema (never inferred — Knack fields arrive stringly-typed), ready
    for the P1 rename map / P3 coercions downstream
    (unitdata_knack_common.py:87-110)."""
    return spark.createDataFrame(
        [tuple(r.get(f.split()[0]) for f in schema.split(", ")) for r in rows],
        schema,
    )
