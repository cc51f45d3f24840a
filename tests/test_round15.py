"""Round-15 targeted tests: compression-ratio quality signal (the
rows-only op); the oracle-backed three are auto-covered by
test_oracle_parity."""

from __future__ import annotations

from atd_data_lake_spark.round15_queries import (
    compression_profile,
    text_compression_ratio,
)


def test_compression_redundant_text_compresses_harder(spark):
    docs = spark.createDataFrame(
        [
            (1, "spam " * 400),  # highly redundant
            (2, " ".join(f"w{i}x{i * 7 % 97}" for i in range(400))),  # varied
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in compression_profile(docs).collect()}
    r_dup = rows[1].zlib_bytes / rows[1].raw_bytes
    r_var = rows[2].zlib_bytes / rows[2].raw_bytes
    assert r_dup < r_var
    assert r_dup < 0.1  # 400 identical tokens must crush


def test_compression_profile_handles_null_and_empty(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in compression_profile(docs).collect()}
    assert rows[1].raw_bytes == 0 and rows[2].raw_bytes == 0
    assert rows[1].zlib_bytes > 0  # zlib header even for empty input


def test_compression_ratio_partition_invariant(spark, sf_dir):
    a = sorted(map(tuple, text_compression_ratio(spark, sf_dir).collect()))
    b = sorted(map(tuple, text_compression_ratio(spark, sf_dir).collect()))
    assert a == b and len(a) > 0
