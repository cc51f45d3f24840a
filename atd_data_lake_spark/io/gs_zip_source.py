"""S5 as a native Spark source: a Python DataSource (Spark 4 API) that
reads GRIDSMART day-ZIP archives directly — ``spark.read.format("gs_zip")``
— replacing the land-then-rescan hop of ``zip_extract.extract_to_dir``.

The reference cracks each archive on its single-threaded host
(gs_investigate.py:16-92, util/zip_helper.py:12-80); here each ZIP is
one InputPartition, so a 10,000-archive backfill extracts on 10,000
tasks with only the file LISTING on the driver.  Both reference layouts
(A: ``MAC/date/GUID.csv`` directories, B: nested ``MAC/date.zip``) are
handled by the same ``extract_zip_bytes`` used for driver-side landing,
so the two paths cannot drift.

Output is one row per CSV line with its archive coordinates::

    zip_path string, mac string, date string, guid string,
    line_no int, line string

Downstream, the S6 schema dispatch applies ``from_csv`` with the
count_version-selected column list (schemas.py GS_V{8,7,4}) — the same
parse the landed-file scan performs, minus the intermediate files.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

GS_ZIP_SCHEMA = (
    "zip_path string, mac string, date string, guid string, "
    "line_no int, line string"
)


class GsZipDataSource(DataSource):
    """``spark.dataSource.register(GsZipDataSource)`` then
    ``spark.read.format("gs_zip").load("/raw/gs/*.zip")``."""

    @classmethod
    def name(cls) -> str:
        return "gs_zip"

    def schema(self) -> str:
        return GS_ZIP_SCHEMA

    def reader(self, schema) -> "GsZipReader":
        return GsZipReader(self.options)

    def streamReader(self, schema) -> "GsZipStreamReader":
        return GsZipStreamReader(self.options)


class _ZipPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class GsZipReader(DataSourceReader):
    def __init__(self, options: dict):
        # `load(path)` lands in options["path"]; accept `paths` (comma
        # separated) for multi-glob reads.
        raw = options.get("paths") or options.get("path")
        if not raw:
            raise ValueError("gs_zip: a path (or paths=) option is required")
        self._globs = [p.strip() for p in raw.split(",") if p.strip()]

    def partitions(self) -> list[_ZipPartition]:
        """Driver side lists FILES only (the same cost as any file
        source's listing); archive bytes never touch the driver."""
        import glob as _glob

        files: list[str] = []
        for g in self._globs:
            hits = sorted(_glob.glob(g))
            # a literal path that glob doesn't match (no magic chars)
            # should fail loudly, matching file-source semantics
            if not hits and not _glob.has_magic(g):
                raise FileNotFoundError(f"gs_zip: no such file: {g}")
            files.extend(hits)
        return [_ZipPartition(p) for p in files]

    def read(self, partition: _ZipPartition):
        """Executor side: crack one archive, emit (coords, line) rows."""
        from atd_data_lake_spark.io.zip_extract import extract_zip_bytes

        with open(partition.path, "rb") as f:
            zones = extract_zip_bytes(f.read())
        for z in zones:
            text = z.data.decode("utf-8", errors="replace")
            for i, line in enumerate(text.splitlines()):
                yield (partition.path, z.mac, z.date, z.guid, i, line)


class GsZipStreamReader(DataSourceStreamReader):
    """Continuous archive ingest: ``spark.readStream.format("gs_zip")``
    tails the landing directory — each micro-batch picks up archives
    that appeared since the last committed offset, one InputPartition
    per new archive (extraction stays on executors, exactly-once via
    the offset log).

    Offset = the sorted file list's high-water mark (lexicographic max
    path already processed).  The reference's landing layout names
    archives by device/date, so lexicographic order is arrival order
    for its nightly drops; a relanded (renamed) archive sorts after the
    mark and is picked up like any new file.  The offset stays O(1) no
    matter how many archives have ever been processed — no seen-set.
    """

    def __init__(self, options: dict):
        raw = options.get("paths") or options.get("path")
        if not raw:
            raise ValueError("gs_zip: a path (or paths=) option is required")
        self._globs = [p.strip() for p in raw.split(",") if p.strip()]

    def _list(self) -> list[str]:
        import glob as _glob

        files: list[str] = []
        for g in self._globs:
            files.extend(_glob.glob(g))
        return sorted(files)

    def initialOffset(self) -> dict:
        return {"last": ""}

    def latestOffset(self) -> dict:
        files = self._list()
        return {"last": files[-1]} if files else {"last": ""}

    def partitions(self, start: dict, end: dict):
        lo, hi = start.get("last", ""), end.get("last", "")
        new = [p for p in self._list() if lo < p <= hi]
        return [_ZipPartition(p) for p in new]

    def read(self, partition: _ZipPartition):
        from atd_data_lake_spark.io.zip_extract import extract_zip_bytes

        with open(partition.path, "rb") as f:
            zones = extract_zip_bytes(f.read())
        for z in zones:
            text = z.data.decode("utf-8", errors="replace")
            for i, line in enumerate(text.splitlines()):
                yield (partition.path, z.mac, z.date, z.guid, i, line)

    def commit(self, end: dict) -> None:
        pass  # the offset log is the source of truth; nothing to clean

    def stop(self) -> None:
        pass


def register(spark) -> None:
    """Idempotent registration of the gs_zip format on a session."""
    spark.dataSource.register(GsZipDataSource)
