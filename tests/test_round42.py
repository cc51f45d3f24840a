"""Round-42 targeted tests — Bloom / count-min sketch invariants the
oracle can't express: hash cross-check against an independent Python
md5 implementation, the no-false-negative guarantee, one-sided error
vs exact counts, build partition-invariance, and counter mergeability.
Full oracle parity runs in test_oracle_parity.py / the driver sweep.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from atd_data_lake_spark.operators.sketches import (
    bloom_bitmap,
    bloom_positions_sql,
    bloom_probe,
    cms_counters,
    cms_estimate,
)
from atd_data_lake_spark.round42_queries import (
    _BLOOM_K,
    _BLOOM_M,
    _CMS_D,
    _CMS_W,
    agg_countmin_user_counts,
    cur_bloom_decontam,
)


def _py_positions(key: str, m: int, k: int) -> list[int]:
    """Independent reimplementation of the md5 double-hash positions."""
    hx = hashlib.md5(key.encode()).hexdigest()
    h1 = int(hx[0:15], 16) % m
    h2 = int(hx[16:31], 16) % m
    return [(h1 + i * h2) % m for i in range(k)]


def test_positions_match_independent_md5(spark):
    keys = ["the quick brown", "fox jumps over", "a b c", "42", "", "ünïcode"]
    df = spark.createDataFrame([(s,) for s in keys], "s string")
    got = {
        r["s"]: r["pos"]
        for r in df.select(
            "s", F.expr(bloom_positions_sql("s", 4096, 3)).alias("pos")
        ).collect()
    }
    for s in keys:
        assert got[s] == _py_positions(s, 4096, 3), s


def test_bloom_no_false_negatives_and_bitmap_partition_invariant(spark):
    keys = [f"key-{i}" for i in range(500)]
    df = spark.createDataFrame([(s,) for s in keys], "s string")
    bm1 = bloom_bitmap(df, "s", 1 << 14, 3)
    bm2 = bloom_bitmap(df.repartition(7), "s", 1 << 14, 3)
    assert bm1 == bm2
    probed = bloom_probe(df, bm1, "s", 1 << 14, 3)
    assert probed.filter(~F.col("bloom_hit")).count() == 0


def test_bloom_probe_matches_python_bit_math(spark):
    members = [f"in-{i}" for i in range(200)]
    others = [f"out-{i}" for i in range(200)]
    m, k = 1 << 12, 3
    mdf = spark.createDataFrame([(s,) for s in members], "s string")
    bitmap = bloom_bitmap(mdf, "s", m, k)
    bits = set()
    for s in members:
        bits.update(_py_positions(s, m, k))
    expect = {
        s: all(p in bits for p in _py_positions(s, m, k))
        for s in members + others
    }
    adf = spark.createDataFrame([(s,) for s in members + others], "s string")
    got = {
        r["s"]: r["bloom_hit"]
        for r in bloom_probe(adf, bitmap, "s", m, k).collect()
    }
    assert got == expect
    # the geometry must actually reject most non-members
    rejected = sum(1 for s in others if not got[s])
    assert rejected > 150


def test_bloom_decontam_flags_superset_of_exact(spark, sf_dir):
    from atd_data_lake_spark.operators.curation import decontaminate

    rep = {r["doc_id"]: r for r in cur_bloom_decontam(spark, sf_dir).collect()}
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    exact = {
        r["doc_id"]: r
        for r in decontaminate(
            d, d.filter(F.col("doc_id") % 20 == 0), n=3
        ).collect()
    }
    assert set(rep) == set(exact)
    for doc_id, r in rep.items():
        e = exact[doc_id]
        assert r["n_shingles"] == e["n_shingles"], doc_id
        # one-sided error: bloom flags AT LEAST the true overlaps
        assert r["n_flagged"] >= e["n_overlap"], doc_id
        if doc_id % 20 == 0:
            # benchmark docs' own shingles are all members
            assert r["n_flagged"] == r["n_shingles"], doc_id


def test_cms_one_sided_error_and_row_totals(spark, sf_dir):
    out = agg_countmin_user_counts(spark, sf_dir).collect()
    assert len(out) > 0
    assert all(r["overcount"] >= 0 for r in out)
    assert all(r["est_count"] >= r["exact_count"] for r in out)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("string").alias("k")
    )
    n = ev.count()
    counters = cms_counters(ev, "k", _CMS_W, _CMS_D)
    # every one of the d rows conserves mass: sum of its cells == N
    totals = (
        counters.groupBy("r").agg(F.sum("cnt").alias("t")).collect()
    )
    assert len(totals) == _CMS_D
    assert all(row["t"] == n for row in totals)


def test_cms_counters_merge_by_cellwise_addition(spark):
    rows = [(i, f"u{i % 37}") for i in range(1000)]
    df = spark.createDataFrame(rows, "i long, k string")
    a = df.filter("i < 400")
    b = df.filter("i >= 400")
    w, d = 256, 4
    whole = {
        (r["r"], r["p"]): r["cnt"]
        for r in cms_counters(df, "k", w, d).collect()
    }
    ca = {
        (r["r"], r["p"]): r["cnt"]
        for r in cms_counters(a, "k", w, d).collect()
    }
    cb = {
        (r["r"], r["p"]): r["cnt"]
        for r in cms_counters(b, "k", w, d).collect()
    }
    merged = dict(ca)
    for cell, cnt in cb.items():
        merged[cell] = merged.get(cell, 0) + cnt
    assert merged == whole


def test_cms_estimate_unseen_watchlist_key_is_zero(spark):
    build = spark.createDataFrame([("a",)] * 7 + [("b",)] * 3, "k string")
    counters = cms_counters(build, "k", 64, 4)
    probes = spark.createDataFrame(
        [("a",), ("b",), ("never-seen-key",)], "k string"
    )
    est = {
        r["k"]: r["est_count"]
        for r in cms_estimate(probes, counters, "k", 64, 4).collect()
    }
    # the unseen key must be PRESENT with est 0 (or a collision-floor
    # value if every one of its 4 cells collides — impossible to hit 4
    # collisions with 2 build keys in a 64-wide sketch here)
    assert set(est) == {"a", "b", "never-seen-key"}
    assert est["a"] == 7 and est["b"] == 3
    assert est["never-seen-key"] == 0


def test_cms_estimate_exact_when_no_collisions(spark):
    # 8 keys in a 1024-wide sketch: collisions are possible but the
    # MIN over 4 rows makes a simultaneous 4-row collision for any key
    # essentially impossible; assert est == exact for this tiny census.
    rows = [(f"k{i % 8}",) for i in range(80)]
    df = spark.createDataFrame(rows, "k string")
    counters = cms_counters(df, "k", 1024, 4)
    est = {
        r["k"]: r["est_count"]
        for r in cms_estimate(
            df.distinct(), counters, "k", 1024, 4
        ).collect()
    }
    assert est == {f"k{i}": 10 for i in range(8)}
