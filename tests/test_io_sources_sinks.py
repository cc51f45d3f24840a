"""Sources/sinks tests: S1 dated-filename scan, S5 zip extraction (both
layouts), S9/S12 layered writer with partition pruning, S13 publisher
merge + chunked REST push, S14 CSV sink, S15 perfmet composition."""

from __future__ import annotations

import os
import zipfile

import pytest
from datetime import datetime

from pyspark.sql import functions as F

from atd_data_lake_spark.io.date_dirs import DatePattern, scan_dated_files
from atd_data_lake_spark.io.publish import merge_public, push_rest, write_csv
from atd_data_lake_spark.io.writer import manifest_row, read_layer, write_layer
from atd_data_lake_spark.io.zip_extract import extract_to_dir, extract_zip_bytes
from atd_data_lake_spark.pipelines import perfmet


def test_s1_dated_filename_scan(spark, tmp_path):
    d = tmp_path / "drop"
    d.mkdir()
    for name in [
        "Austin_bt_12-03-2019.txt",
        "Austin_bt_12-04-2019.txt",
        "Austin_btmatch_12-03-2019.txt",
        "unrelated.txt",
    ]:
        (d / name).write_text("x")
    pats = [
        DatePattern("unmatched", "Austin_bt_", ".txt"),
        DatePattern("matched", "Austin_btmatch_", ".txt"),
    ]
    out = scan_dated_files(spark, str(d), pats).collect()
    got = {(r["kind"], str(r["file_date"])) for r in out}
    assert got == {
        ("unmatched", "2019-12-03"),
        ("unmatched", "2019-12-04"),
        ("matched", "2019-12-03"),
    }
    # matched files only; unrelated.txt excluded
    assert all("unrelated" not in r["path"] for r in out)


def _make_zip(path, layout):
    with zipfile.ZipFile(path, "w") as zf:
        if layout == "A":
            zf.writestr("00-0A-0B-0C-0D-0E/2019-06-03/abc123.csv", "8,23,1,2\n")
            zf.writestr("00-0A-0B-0C-0D-0E/2019-06-03/def456.csv", "8,23,3,4\n")
            zf.writestr("11-1A-1B-1C-1D-1E/2019-06-03/ggg789.csv", "8,23,5,6\n")
        else:
            import io as _io

            inner = _io.BytesIO()
            with zipfile.ZipFile(inner, "w") as izf:
                izf.writestr("abc123.csv", "8,23,1,2\n")
            zf.writestr("00-0A-0B-0C-0D-0E/2019-06-03.zip", inner.getvalue())


def test_s5_zip_layout_a_extracts_all_macs(tmp_path):
    zp = tmp_path / "day.zip"
    _make_zip(zp, "A")
    zones = extract_zip_bytes(zp.read_bytes())
    assert {(z.mac, z.guid) for z in zones} == {
        ("00-0A-0B-0C-0D-0E", "abc123"),
        ("00-0A-0B-0C-0D-0E", "def456"),
        ("11-1A-1B-1C-1D-1E", "ggg789"),  # reference only took the first MAC
    }
    paths = extract_to_dir(str(zp), str(tmp_path / "out"))
    assert len(paths) == 3 and all(os.path.exists(p) for p in paths)


def test_s5_zip_layout_b_nested(tmp_path):
    zp = tmp_path / "day_b.zip"
    _make_zip(zp, "B")
    zones = extract_zip_bytes(zp.read_bytes())
    assert [(z.mac, z.date, z.guid) for z in zones] == [
        ("00-0A-0B-0C-0D-0E", "2019-06-03", "abc123")
    ]
    assert zones[0].data == b"8,23,1,2\n"


def test_s9_layer_write_partition_pruning(spark, tmp_path):
    df = spark.createDataFrame(
        [("bt", "2019-12-03", 1), ("bt", "2019-12-04", 2), ("wt", "2019-12-03", 3)],
        "data_source string, collection_date string, v int",
    )
    write_layer(df, str(tmp_path / "lake"), "raw")
    back = read_layer(spark, str(tmp_path / "lake"), "raw", data_source="bt")
    assert back.count() == 2
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan  # pruning reached the scan
    # dynamic-overwrite idempotent re-run of one partition
    df2 = spark.createDataFrame(
        [("bt", "2019-12-03", 99)], "data_source string, collection_date string, v int"
    )
    write_layer(df2, str(tmp_path / "lake"), "raw", mode="overwrite")
    after = read_layer(spark, str(tmp_path / "lake"), "raw").collect()
    # partition values come back type-inferred (string -> date)
    vals = {(r["data_source"], str(r["collection_date"])): r["v"] for r in after}
    assert vals[("bt", "2019-12-03")] == 99  # replaced
    assert vals[("bt", "2019-12-04")] == 2  # untouched
    assert vals[("wt", "2019-12-03")] == 3  # untouched


def test_s12_manifest_row(spark):
    df = spark.range(5)
    m = manifest_row(df, data_type="bluetooth", file_type="unmatched").collect()[0]
    assert m["records"] == 5 and m["data_type"] == "bluetooth"


def test_s13_merge_and_chunked_push(spark, tmp_path):
    existing = spark.createDataFrame(
        [("r1", 10), ("r2", 20)], "record_id string, v int"
    )
    updates = spark.createDataFrame(
        [("r2", 99), ("r3", 30)], "record_id string, v int"
    )
    merged = merge_public(existing, updates)
    got = {r["record_id"]: r["v"] for r in merged.collect()}
    assert got == {"r1": 10, "r2": 99, "r3": 30}

    # chunked REST push via an accumulator directory (executor-side writes)
    out_dir = tmp_path / "chunks"
    out_dir.mkdir()

    def send(batch):
        import uuid

        (out_dir / f"{uuid.uuid4().hex}.txt").write_text(str(len(batch)))

    push_rest(spark.range(25).repartition(2), send, chunk_size=10)
    sizes = sorted(int(p.read_text()) for p in out_dir.iterdir())
    assert sum(sizes) == 25
    assert all(s <= 10 for s in sizes)


def test_s13_merge_public_layer_rewrites_only_touched_partitions(
    spark, tmp_path
):
    """The batch upsert is partition-scoped: files of partitions not
    present in the update batch are byte-identical after the merge (same
    names, same mtimes) — no O(table) rewrite."""
    from atd_data_lake_spark.io.publish import merge_public_layer

    path = str(tmp_path / "public")
    initial = spark.createDataFrame(
        [
            ("bt", "2019-12-01", "r1", 10),
            ("bt", "2019-12-01", "r2", 20),
            ("bt", "2019-12-02", "r3", 30),
            ("wt", "2019-12-01", "r4", 40),
        ],
        "data_source string, collection_date string, record_id string, v int",
    )
    merge_public_layer(spark, path, initial)

    def files_of(part: str) -> dict[str, float]:
        import os

        d = f"{path}/{part}"
        return {
            f: os.path.getmtime(f"{d}/{f}")
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    untouched_before = {
        p: files_of(p)
        for p in (
            "data_source=bt/collection_date=2019-12-02",
            "data_source=wt/collection_date=2019-12-01",
        )
    }

    updates = spark.createDataFrame(
        [("bt", "2019-12-01", "r2", 99), ("bt", "2019-12-01", "r9", 90)],
        "data_source string, collection_date string, record_id string, v int",
    )
    merge_public_layer(spark, path, updates)

    got = {
        r["record_id"]: r["v"] for r in spark.read.parquet(path).collect()
    }
    assert got == {"r1": 10, "r2": 99, "r3": 30, "r4": 40, "r9": 90}
    for part, before in untouched_before.items():
        assert files_of(part) == before, f"{part} was rewritten"


def test_s14_csv_sink(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string")
    write_csv(df.coalesce(1), str(tmp_path / "csv_out"))
    files = [p for p in (tmp_path / "csv_out").iterdir() if p.suffix == ".csv"]
    content = files[0].read_text().strip().splitlines()
    assert content[0] == "id,s" and len(content) == 3


def test_s15_perfmet_composition(spark):
    obs = spark.createDataFrame(
        [
            ("s1", "Unmatched Entries", 10.0, datetime(2019, 12, d), 5)
            for d in range(1, 9)
        ]
        + [("s2", "Unmatched Entries", 4.0, datetime(2019, 12, 8), 2)],
        "sensor_name string, data_type string, data double, "
        "collection_date timestamp, n_obs int",
    )
    with_exp = perfmet.with_expected(obs)
    r = {
        (x["sensor_name"], x["collection_date"].day): x["expected"]
        for x in with_exp.collect()
    }
    assert r[("s1", 8)] == 10.0 and r[("s2", 8)] == 4.0

    latest = perfmet.latest_obs(obs)
    assert latest.filter(F.col("sensor_name") == "s1").collect()[0][
        "collection_date"
    ] == datetime(2019, 12, 8)

    job = perfmet.job_row(
        obs,
        "bt",
        "Standardize",
        1.25,
        ts_col="collection_date",
        end_col="collection_date",
    ).collect()[0]
    assert job["records"] == 42 and job["stage"] == "Standardize"

    sensors = spark.createDataFrame([("s1",), ("s2",), ("s3",)], "sensor_name string")
    miss = perfmet.missing_data_sentinel(obs, sensors).collect()
    assert [(m["sensor_name"], m["data"]) for m in miss] == [("s3", -1.0)]


def test_bogus_sf_dir_raises_clean_analysis_exception(spark):
    """A wrong data directory fails fast with PATH_NOT_FOUND at plan
    time — not a mid-job executor error."""
    from pyspark.errors import AnalysisException

    from atd_data_lake_spark.queries import QUERIES

    with pytest.raises(AnalysisException):
        QUERIES["q1_pricing_summary"](spark, "/nonexistent/sfX").collect()


def test_compaction_merges_small_files_and_leaves_neighbors(spark, tmp_path):
    from atd_data_lake_spark.io.writer import compact_partitions, plan_compaction

    lake = str(tmp_path / "lake")
    # accrete 8 tiny files in one partition (per-append jobs), 1 in another
    for i in range(8):
        write_layer(
            spark.createDataFrame(
                [("bt", "2019-12-03", i)],
                "data_source string, collection_date string, v int",
            ).coalesce(1),
            lake,
            "raw",
        )
    write_layer(
        spark.createDataFrame(
            [("wt", "2019-12-03", 100)],
            "data_source string, collection_date string, v int",
        ).coalesce(1),
        lake,
        "raw",
    )

    def part_files(part):
        d = os.path.join(lake, "raw", part)
        return sorted(
            f for f in os.listdir(d) if f.endswith(".parquet")
        )

    frag = "data_source=bt/collection_date=2019-12-03"
    neighbor = "data_source=wt/collection_date=2019-12-03"
    assert len(part_files(frag)) == 8
    neighbor_before = [
        (f, os.path.getmtime(os.path.join(lake, "raw", neighbor, f)))
        for f in part_files(neighbor)
    ]

    plans = plan_compaction(spark, lake, "raw", target_file_bytes=128 << 20)
    assert [p["partition"] for p in plans] == [frag]
    assert plans[0]["n_files"] == 8 and plans[0]["target_files"] == 1

    executed = compact_partitions(spark, lake, "raw", target_file_bytes=128 << 20)
    assert executed == plans
    assert len(part_files(frag)) == 1
    # all rows survive, neighbor partition files untouched (same mtimes)
    back = read_layer(spark, lake, "raw").collect()
    assert sorted(r["v"] for r in back) == list(range(8)) + [100]
    neighbor_after = [
        (f, os.path.getmtime(os.path.join(lake, "raw", neighbor, f)))
        for f in part_files(neighbor)
    ]
    assert neighbor_after == neighbor_before
    # idempotent: a second audit finds nothing to do
    assert plan_compaction(spark, lake, "raw", target_file_bytes=128 << 20) == []


def test_cluster_by_gives_disjoint_file_ranges(spark, tmp_path):
    """cluster_by range-partitions + sorts, so the files inside a day
    partition cover disjoint cluster-key ranges — the property that lets
    timestamp-range readers skip whole files via parquet min/max."""
    import pyarrow.parquet as pq

    lake = str(tmp_path / "lake")
    df = spark.range(0, 20000).selectExpr(
        "'bt' AS data_source",
        "'2019-12-03' AS collection_date",
        "CAST(id * 2654435761 % 20000 AS BIGINT) AS ts",  # scrambled
    )
    write_layer(df, lake, "raw", cluster_by=("ts",), cluster_files=4)
    part = os.path.join(lake, "raw", "data_source=bt/collection_date=2019-12-03")
    ranges = []
    for fname in os.listdir(part):
        if not fname.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(part, fname)).metadata
        s = [md.row_group(i).column(0).statistics for i in range(md.num_row_groups)]
        ranges.append((min(x.min for x in s), max(x.max for x in s)))
    assert len(ranges) > 1  # the range shuffle actually split the data
    ranges.sort()
    for (lo_a, hi_a), (lo_b, hi_b) in zip(ranges, ranges[1:]):
        assert hi_a <= lo_b  # disjoint, ordered file ranges
    # and every row survived the re-layout
    assert (
        read_layer(spark, lake, "raw").count() == 20000
    )


def test_delete_keys_rewrites_only_touched_partitions(spark, tmp_path):
    """delete_keys removes exactly the condemned rows, leaves untouched
    partitions byte-identical, drops fully-emptied partition dirs, and
    is idempotent."""
    import os

    from pyspark.sql import functions as F

    from atd_data_lake_spark.io.writer import delete_keys

    root = str(tmp_path / "public")
    df = spark.createDataFrame(
        [
            # (record_id, data_source, collection_date, payload)
            ("a1", "bt", "2019-06-01", 1),
            ("a2", "bt", "2019-06-01", 2),
            ("b1", "bt", "2019-06-02", 3),
            ("b2", "bt", "2019-06-02", 4),
            ("c1", "bt", "2019-06-03", 5),
        ],
        "record_id string, data_source string, collection_date string, payload int",
    )
    df.write.partitionBy("data_source", "collection_date").parquet(root)

    def files_with_mtime(day):
        d = f"{root}/data_source=bt/collection_date={day}"
        if not os.path.isdir(d):
            return None
        return sorted(
            (f, os.path.getmtime(os.path.join(d, f)))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    untouched_before = files_with_mtime("2019-06-01")

    # delete one row of 06-02 (partial) and the only row of 06-03 (full)
    keys = spark.createDataFrame([("b1",), ("c1",)], "record_id string")
    stats = delete_keys(spark, root, keys)
    assert stats == {"touched_partitions": 2, "deleted_rows": 2}

    out = spark.read.parquet(root)
    assert sorted(r["record_id"] for r in out.collect()) == ["a1", "a2", "b2"]
    # untouched partition: files byte-identical (same names + mtimes)
    assert files_with_mtime("2019-06-01") == untouched_before
    # fully-deleted partition directory is gone
    assert files_with_mtime("2019-06-03") is None

    # idempotent: second call touches nothing
    assert delete_keys(spark, root, keys) == {
        "touched_partitions": 0,
        "deleted_rows": 0,
    }
