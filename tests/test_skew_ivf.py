"""Skew-join helper and IVF ANN tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from atd_data_lake_spark.operators.similarity import cosine_topk, ivf_topk
from atd_data_lake_spark.operators.skew import salted_count, salted_join


def test_salted_join_matches_plain_join(spark):
    # heavily skewed big side: 90% of rows share key 1
    big = spark.createDataFrame(
        [(1 if i % 10 else 2, i) for i in range(1000)], "k int, v int"
    )
    small = spark.createDataFrame([(1, "hot"), (2, "cold"), (3, "none")], "k int, s string")
    plain = big.join(small, "k").groupBy("k", "s").agg(F.count("*").alias("n"))
    salted = salted_join(big, small, "k").groupBy("k", "s").agg(F.count("*").alias("n"))
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_count_matches_plain(spark):
    df = spark.createDataFrame([(1 if i % 20 else 2,) for i in range(500)], "k int")
    plain = {r["k"]: r["n"] for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()}
    salted = {r["k"]: r["n"] for r in salted_count(df, "k").collect()}
    assert plain == salted


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    from atd_data_lake_spark.io.reader import read_table

    return read_table(spark, sf_dir, "embeddings")


def test_ivf_recall_against_exact(emb):
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(emb, queries, k=10)
    approx = ivf_topk(emb, queries, k=10, n_cells=8, n_probe=4)
    ex = {}
    for r in exact.collect():
        ex.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    ap = {}
    for r in approx.collect():
        ap.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    # probing half the cells: expect solid (not perfect) recall@10
    recalls = [len(ex[q] & ap.get(q, set())) / 10 for q in ex]
    assert sum(recalls) / len(recalls) >= 0.5
    # scores of returned neighbors must equal the exact scores
    ex_scores = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in exact.collect()
    }
    for r in approx.collect():
        key = (r["query_id"], r["neighbor_id"])
        if key in ex_scores:
            assert r["cos_sim"] == ex_scores[key]


def test_ivf_deterministic(emb):
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    r1 = sorted(map(tuple, ivf_topk(emb, queries, k=5).collect()))
    r2 = sorted(map(tuple, ivf_topk(emb, queries, k=5).collect()))
    assert r1 == r2
