"""Scale-path guarantees for the dedup/similarity operators (VERDICT r1
#2/#3): the large-corpus ``embedding_near_dups`` path must never collect
the corpus to the driver, and SimHash must reject parameters that break
its pigeonhole recall guarantee.
"""

from __future__ import annotations

import pytest
from pyspark.sql import DataFrame

from atd_data_lake_spark.io.reader import read_table
from atd_data_lake_spark.operators.dedup import simhash_near_dups
from atd_data_lake_spark.operators.similarity import embedding_near_dups


def test_large_path_never_collects_corpus(spark, sf_dir, monkeypatch):
    """Force the LSH path (max_collect_rows=0) with DataFrame.collect
    poisoned: plan construction must not pull the corpus to the driver."""
    emb = read_table(spark, sf_dir, "embeddings")

    real_collect = DataFrame.collect

    def poisoned(self):
        raise AssertionError("scale path collected a DataFrame to the driver")

    monkeypatch.setattr(DataFrame, "collect", poisoned)
    out = embedding_near_dups(emb, threshold=0.85, max_collect_rows=0)
    monkeypatch.setattr(DataFrame, "collect", real_collect)

    lsh_pairs = {(r.id_a, r.id_b) for r in out.collect()}
    exact = embedding_near_dups(emb, threshold=0.85)  # small corpus → exact
    exact_pairs = {(r.id_a, r.id_b) for r in exact.collect()}

    # exact re-rank ⇒ every LSH pair is a true pair (precision 1.0)
    assert lsh_pairs <= exact_pairs
    # banded recall with 8 bands of 2 bits is ≈0.999 at these thresholds
    if exact_pairs:
        assert len(lsh_pairs) / len(exact_pairs) >= 0.9


def test_lsh_and_exact_paths_share_scores(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    exact = {
        (r.id_a, r.id_b): r.cos_sim
        for r in embedding_near_dups(emb, threshold=0.85).collect()
    }
    lsh = {
        (r.id_a, r.id_b): r.cos_sim
        for r in embedding_near_dups(emb, threshold=0.85, max_collect_rows=0).collect()
    }
    for pair, sim in lsh.items():
        assert exact[pair] == sim  # identical rounding/scoring on both paths


def test_simhash_rejects_broken_pigeonhole(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_near_dups(df, max_hamming=4, block_bits=16)
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_near_dups(df, max_hamming=8, block_bits=8)


def test_ngram_jaccard_prefix_filter_equivalent(spark, sf_dir):
    """PPJoin prefix path returns EXACTLY the inverted-index result at
    every threshold (prefix pruning is lossless by the prefix-filter
    theorem; the ε-guarded ceil keeps it so at float-hostile t·|S|)."""
    from atd_data_lake_spark.operators.dedup import ngram_jaccard_pairs

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for t in (0.1, 0.5, 0.8):
        a = sorted(
            map(tuple, ngram_jaccard_pairs(d, threshold=t, prefix_filter=False).collect())
        )
        b = sorted(
            map(tuple, ngram_jaccard_pairs(d, threshold=t, prefix_filter=True).collect())
        )
        assert a == b
        if t <= 0.5:
            assert len(a) > 0


def test_embedding_near_dups_banding_scales_with_corpus(spark, sf_dir):
    """The LSH scale path must find every replica pair on a duplicated
    corpus (near-identical vectors ⇒ recall ≈ 1 at any auto-sized r),
    with the corpus never collected (max_collect_rows=0)."""
    from pyspark.sql import functions as F

    from atd_data_lake_spark.operators.similarity import embedding_near_dups

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    reps = spark.range(3).select(F.col("id").alias("_rep"))
    big = (
        emb.crossJoin(F.broadcast(reps))
        .withColumn("vec_id", F.col("vec_id") + F.col("_rep") * F.lit(10**9))
        .drop("_rep")
    )
    n = emb.count()
    pairs = embedding_near_dups(big, threshold=0.999, max_collect_rows=0)
    # every base vector contributes C(3,2)=3 identical-replica pairs
    assert pairs.count() >= 3 * n
