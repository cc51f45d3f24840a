"""The gs_zip Python DataSource (S5 as a native Spark source): archive
rows equal the driver-side extractor's, partitions map 1:1 to archives,
and from_csv over the emitted lines reproduces the landed-file scan.
"""

from __future__ import annotations

import io
import zipfile

import pytest
from pyspark.sql import functions as F


def _make_zip(path, layout):
    with zipfile.ZipFile(path, "w") as zf:
        if layout == "A":
            zf.writestr("00-0A-0B-0C-0D-0E/2019-06-03/abc123.csv", "8,23,1,2\n8,23,9,9\n")
            zf.writestr("00-0A-0B-0C-0D-0E/2019-06-03/def456.csv", "8,23,3,4\n")
            zf.writestr("11-1A-1B-1C-1D-1E/2019-06-03/ggg789.csv", "8,23,5,6\n")
        else:
            inner = io.BytesIO()
            with zipfile.ZipFile(inner, "w") as izf:
                izf.writestr("abc123.csv", "8,23,1,2\n")
            zf.writestr("00-0A-0B-0C-0D-0E/2019-06-03.zip", inner.getvalue())


@pytest.fixture()
def registered(spark):
    from atd_data_lake_spark.io.gs_zip_source import register

    register(spark)
    return spark


def test_gs_zip_source_matches_extractor(registered, tmp_path):
    from atd_data_lake_spark.io.zip_extract import extract_zip_bytes

    za, zb = tmp_path / "a.zip", tmp_path / "b.zip"
    _make_zip(za, "A")
    _make_zip(zb, "B")
    df = registered.read.format("gs_zip").load(str(tmp_path / "*.zip"))
    rows = df.collect()

    expected = set()
    for zp in (za, zb):
        for z in extract_zip_bytes(zp.read_bytes()):
            for i, line in enumerate(z.data.decode().splitlines()):
                expected.add((str(zp), z.mac, z.date, z.guid, i, line))
    got = {tuple(r) for r in rows}
    assert got == expected
    # both layouts, every MAC dir (reference only took the first)
    assert {r.mac for r in rows} == {"00-0A-0B-0C-0D-0E", "11-1A-1B-1C-1D-1E"}


def test_gs_zip_one_partition_per_archive(registered, tmp_path):
    for i in range(3):
        _make_zip(tmp_path / f"d{i}.zip", "A")
    df = registered.read.format("gs_zip").load(str(tmp_path / "*.zip"))
    assert df.rdd.getNumPartitions() == 3


def test_gs_zip_missing_literal_path_fails(registered, tmp_path):
    df = registered.read.format("gs_zip").load(str(tmp_path / "nope.zip"))
    with pytest.raises(Exception, match="no such file"):
        df.collect()


def test_gs_zip_lines_parse_like_landed_scan(registered, spark, tmp_path):
    """from_csv over the source's line rows == spark.read.csv over the
    extracted landing files (the S6 parse on both paths)."""
    from atd_data_lake_spark.io.zip_extract import extract_to_dir

    zp = tmp_path / "day.zip"
    _make_zip(zp, "A")
    schema = "count_version int, code int, c1 int, c2 int"
    via_source = (
        registered.read.format("gs_zip")
        .load(str(zp))
        .select(F.from_csv("line", schema).alias("r"))
        .select("r.*")
    )
    out = tmp_path / "landed"
    extract_to_dir(str(zp), str(out))
    via_files = spark.read.csv(f"{out}/*/*/*.csv", schema=schema)
    assert sorted(map(tuple, via_source.collect())) == sorted(
        map(tuple, via_files.collect())
    )


def test_gs_zip_stream_picks_up_new_archives(registered, tmp_path):
    """availableNow batch 1 ingests the existing archive; a second run
    after a new archive lands ingests ONLY the new one (offset log)."""
    land = tmp_path / "land"
    land.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    _make_zip(land / "2019-06-03.zip", "A")

    def run_once():
        q = (
            registered.readStream.format("gs_zip")
            .load(str(land / "*.zip"))
            .writeStream.format("parquet")
            .option("checkpointLocation", ckpt)
            .option("path", out)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    first = registered.read.parquet(out)
    assert first.count() == 4  # layout A fixture: 4 lines
    assert {r.zip_path for r in first.select("zip_path").distinct().collect()} == {
        str(land / "2019-06-03.zip")
    }

    _make_zip(land / "2019-06-04.zip", "B")
    run_once()
    both = registered.read.parquet(out)
    assert both.count() == 5  # +1 line from the layout-B archive
    # the first archive was NOT re-ingested
    from pyspark.sql import functions as _F

    per = {r.zip_path: r.n for r in both.groupBy("zip_path").agg(_F.count("*").alias("n")).collect()}
    assert per[str(land / "2019-06-03.zip")] == 4
    assert per[str(land / "2019-06-04.zip")] == 1
