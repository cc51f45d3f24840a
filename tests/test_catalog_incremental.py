"""Catalog + incremental-plan semantics (SURVEY §5's manual procedures,
automated): upsert PK last-write-wins, re-run idempotency (zero new
items), force re-emits, interval-overlap coverage, last_run_date bound."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from atd_data_lake_spark import catalog as cat
from atd_data_lake_spark.operators.incremental import incremental_plan


def _cat_rows(spark, rows):
    return spark.createDataFrame(rows, cat.CATALOG_SCHEMA)


def _r(repo, base, day, end=None, pointer="p", ext="file.json"):
    return (
        repo,
        "bt",
        base,
        ext,
        pointer,
        datetime(2019, 12, day),
        datetime(2019, 12, end) if end else None,
        datetime(2020, 1, 1),
        "{}",
    )


@pytest.fixture()
def raw_listing(spark):
    return _cat_rows(
        spark,
        [
            _r("raw", "austin", 1),
            _r("raw", "austin", 2),
            _r("raw", "austin", 3),
            _r("raw", "round_rock", 2),
        ],
    )


def test_upsert_pk_last_write_wins(spark, raw_listing):
    updated = _cat_rows(spark, [_r("raw", "austin", 2, pointer="p2")])
    merged = cat.upsert(raw_listing, updated)
    assert merged.count() == 4  # no duplicate PK rows
    row = merged.filter(
        (F.col("id_base") == "austin")
        & (F.col("collection_date") == datetime(2019, 12, 2))
    ).collect()
    assert [r["pointer"] for r in row] == ["p2"]


def test_incremental_emits_only_missing(spark, raw_listing):
    done = _cat_rows(spark, [_r("rawjson", "austin", 1), _r("rawjson", "austin", 3)])
    todo = incremental_plan(raw_listing, done)
    got = {(r["id_base"], r["collection_date"].day) for r in todo.collect()}
    assert got == {("austin", 2), ("round_rock", 2)}


def test_incremental_rerun_is_idempotent(spark, raw_listing):
    todo = incremental_plan(raw_listing, raw_listing)
    assert todo.count() == 0  # everything covered -> no work


def test_incremental_force_reemits_all(spark, raw_listing):
    todo = incremental_plan(raw_listing, raw_listing, force=True)
    assert todo.count() == 4


def test_incremental_interval_overlap_covers(spark, raw_listing):
    # one target row spanning Dec 1-4 (collection_end exclusive) covers all
    # austin days via the overlap rule (last_update.py:65-75)
    done = _cat_rows(spark, [_r("rawjson", "austin", 1, end=4)])
    todo = incremental_plan(raw_listing, done)
    got = {(r["id_base"], r["collection_date"].day) for r in todo.collect()}
    assert got == {("round_rock", 2)}


def test_incremental_last_run_date_bound(spark, raw_listing):
    done = _cat_rows(spark, [])
    todo = incremental_plan(raw_listing, done, last_run_date=datetime(2019, 12, 3))
    got = {(r["id_base"], r["collection_date"].day) for r in todo.collect()}
    assert got == {("austin", 3)}


def test_catalog_query_filters_and_latest(spark, raw_listing):
    got = cat.query(
        raw_listing,
        repository="raw",
        id_base="austin",
        start=datetime(2019, 12, 2),
    ).collect()
    assert [r["collection_date"].day for r in got] == [2, 3]
    top = cat.latest(raw_listing, id_base="austin").collect()
    assert top[0]["collection_date"].day == 3
    ext = cat.query(raw_listing, ext_like="%.json").count()
    assert ext == 4
