"""Similarity search over embedding columns (array<float>).

Beyond-reference extension (BASELINE.json north star).  Two paths:

- ``cosine_topk`` — exact brute-force top-k: broadcast the (small) query
  set against the corpus; the dot product is a zip_with/aggregate column
  expression (JVM-side, no UDF); top-k via window rank.  At 100 TB this
  is the correctness baseline and is still the right plan when the query
  set is small (queries broadcast; corpus never shuffles until the final
  per-query top-k, which shuffles only (query, candidate score) pairs).

- ``lsh_topk`` — random-hyperplane (sign) LSH bucketing: corpus and
  queries hash to sign-bit buckets; candidates are bucket-equi-join
  matches (multi-probe over bands), scored exactly, then top-k.  The
  scale path: candidate generation is an equi-join, never a cross join.

Hyperplanes are generated from a fixed seed so results are deterministic.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns, computed in double."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries``: (query_id, embedding).  Excludes self-matches when ids
    collide.  Output: (query_id, neighbor_id, cos_sim, rank) with
    deterministic tie-break on neighbor id.
    """
    q = queries.select(
        F.col(query_id_col).alias("_qid"), F.col(vec_col).alias("_qvec")
    )
    scored = corpus.join(F.broadcast(q), F.col(id_col) != F.col("_qid")).withColumn(
        "cos_sim", F.round(cosine_similarity(F.col("_qvec"), F.col(vec_col)), 6)
    )
    w = Window.partitionBy("_qid").orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias("query_id"),
            F.col(id_col).alias("neighbor_id"),
            "cos_sim",
            "rank",
        )
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def signature_bits(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH signature as array<int> of 0/1 per hyperplane."""
    return F.array(
        *[
            F.when(
                _dot(vec, F.array(*[F.lit(float(w)) for w in p])) >= 0, 1
            ).otherwise(0)
            for p in planes
        ]
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int = 64,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: sign-LSH banded bucketing for candidates, exact
    cosine re-rank.  A query and corpus vector are candidates iff they
    agree on all bits of at least one band.
    """
    planes = _hyperplanes(dim, n_planes, seed)
    rows_per_band = n_planes // bands

    def banded(df: DataFrame, idc: str) -> DataFrame:
        sig = signature_bits(F.col(vec_col), planes)
        return df.select(
            F.col(idc).alias("_id"),
            F.col(vec_col).alias("_vec"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.concat_ws(
                                "",
                                *[
                                    sig[b * rows_per_band + r].cast("string")
                                    for r in range(rows_per_band)
                                ],
                            ).alias("bucket"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bb"),
        ).select("_id", "_vec", "bb.band", "bb.bucket")

    c = banded(corpus, id_col)
    q = banded(queries, query_id_col).withColumnRenamed("_id", "_qid").withColumnRenamed(
        "_vec", "_qvec"
    )
    cands = (
        c.join(F.broadcast(q), ["band", "bucket"])
        .filter(F.col("_id") != F.col("_qid"))
        .select("_id", "_vec", "_qid", "_qvec")
        .distinct()
    )
    scored = cands.withColumn(
        "cos_sim", F.round(cosine_similarity(F.col("_qvec"), F.col("_vec")), 6)
    )
    w = Window.partitionBy("_qid").orderBy(F.col("cos_sim").desc(), F.col("_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias("query_id"),
            F.col("_id").alias("neighbor_id"),
            "cos_sim",
            "rank",
        )
    )
