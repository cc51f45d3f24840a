"""Round-43 targeted tests — KMV mergeability/exactness-below-k/error
bound and Efraimidis–Spirakis determinism + weighted bias.  Full oracle
parity runs in test_oracle_parity.py / the driver sweep.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from atd_data_lake_spark.round43_queries import (
    _KMV_K,
    _RES_K,
    _TWO60,
    agg_kmv_distinct,
    cur_weighted_reservoir,
)


def _h60(key) -> int:
    return int(hashlib.md5(str(key).encode()).hexdigest()[0:15], 16)


def test_kmv_merge_equals_global_kmin():
    """k smallest of the union of per-group k-min sets == k smallest of
    the union of the full sets (the min-closure the 'ALL' scope relies
    on) — pure property check on the hash values themselves."""
    groups = {
        "a": [f"u{i}" for i in range(0, 300)],
        "b": [f"u{i}" for i in range(150, 500)],
        "c": [f"u{i}" for i in range(400, 420)],
    }
    per_group_kmin = [
        sorted(_h60(k) for k in ks)[:_KMV_K] for ks in groups.values()
    ]
    merged_from_sketches = sorted(
        set(h for km in per_group_kmin for h in km)
    )[:_KMV_K]
    global_kmin = sorted(set(_h60(k) for ks in groups.values() for k in ks))[
        :_KMV_K
    ]
    assert merged_from_sketches == global_kmin


def test_kmv_estimates_within_bound_and_exact_below_k(spark, sf_dir):
    rows = {r["scope"]: r for r in agg_kmv_distinct(spark, sf_dir).collect()}
    assert "ALL" in rows
    for scope, r in rows.items():
        exact = r["exact_distinct"]
        if exact < _KMV_K:
            assert r["est_distinct"] == float(exact), scope
        else:
            # KMV relative stderr ≈ 1/sqrt(k-2); allow 4 sigma
            tol = 4.0 / math.sqrt(_KMV_K - 2)
            assert abs(r["est_distinct"] - exact) <= tol * exact, (scope, r)


def test_kmv_exact_when_under_k(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, None, i % 5, "t", 1.0, "{}") for i in range(40)],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out = {
        r["scope"]: r for r in agg_kmv_distinct(spark, str(tmp_path)).collect()
    }
    assert out["t"]["exact_distinct"] == 5
    assert out["t"]["est_distinct"] == 5.0
    assert out["ALL"]["est_distinct"] == 5.0


def test_reservoir_deterministic_and_keys_cross_checked(spark, sf_dir):
    a = cur_weighted_reservoir(spark, sf_dir).collect()
    b = cur_weighted_reservoir(spark, sf_dir).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == _RES_K
    docs = {
        r["doc_id"]: r["n_chars"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "n_chars")
        .collect()
    }
    for r in a[:5]:
        u = (_h60(r["doc_id"]) + 1.0) / _TWO60
        key = math.log(u) / docs[r["doc_id"]]
        assert abs(key - r["sample_key"]) < 1e-8, r


def test_reservoir_prefers_heavy_docs(spark, sf_dir):
    sample = cur_weighted_reservoir(spark, sf_dir).collect()
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("n_chars") > 0
    )
    pop_mean = d.agg(F.avg("n_chars")).first()[0]
    samp_mean = sum(r["weight"] for r in sample) / len(sample)
    assert samp_mean > pop_mean
