"""SemDeDup-style semantic deduplication over an embedding column.

The scale recipe (Abbas et al., "SemDeDup", 2023; public method): a
cheap coarse clustering partitions the corpus so that semantic
near-duplicates land in the same cluster with high probability, then an
exact pairwise pass WITHIN each cluster prunes vectors whose cosine
similarity to an already-kept cluster member exceeds the threshold.
Cross-cluster pairs are never scored — that is what makes the all-pairs
cost collapse from O(N²) to O(Σ|cluster|²).

Spark plan (the part that matters at 100 TB):

1. centroids are k-means-trained on a bounded, deterministic sample
   (reusing the IVF coarse quantizer from operators/similarity.py) and
   closure-broadcast — the corpus never reaches the driver;
2. cell assignment is one Arrow-batched map pass (no shuffle);
3. the ONLY shuffle keys vectors by cell id for the per-cluster greedy
   prune (`applyInPandas`); its output is id-sized, not vector-sized.

Cluster-size discipline: `n_clusters` must scale with the corpus so a
cluster's vectors fit one executor (10⁶ rows × 64 f64 ≈ 512 MB — size
clusters an order below that).  The greedy prune is O(|cluster| ×
kept-per-cluster) block matmuls, vectorized in numpy.

Determinism: the sample is id-ordered, k-means is seeded, and the
within-cluster scan is id-ordered — same inputs, same keeps, any
partitioning (tested).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from atd_data_lake_spark.operators.scale import fan_out
from atd_data_lake_spark.operators.similarity import (
    _kmeans_centroids,
    _round_half_up,
    _sq_dists,
)

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("cluster", T.IntegerType()),
        T.StructField("keep", T.BooleanType()),
        T.StructField("dup_of", T.LongType()),
        T.StructField("max_sim", T.DoubleType()),
    ]
)


def semantic_dedup(
    corpus: DataFrame,
    n_clusters: int = 32,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample: int = 2048,
    seed: int = 42,
) -> DataFrame:
    """One row per corpus vector: its cluster, whether it survives the
    semantic prune, the kept member it duplicates (`dup_of`, null when
    kept), and its max cosine similarity to earlier-kept members."""
    from atd_data_lake_spark.operators.similarity import drop_null_vectors

    corpus = drop_null_vectors(corpus, vec_col)
    sample_rows = (
        corpus.orderBy(id_col).select(vec_col).limit(train_sample).collect()
    )
    sample = np.array([r[0] for r in sample_rows], dtype=np.float64)
    centroids = _kmeans_centroids(sample, n_clusters, seed=seed)

    cell_schema = T.StructType(
        [
            T.StructField("_id", T.LongType()),
            T.StructField("_vec", corpus.schema[vec_col].dataType),
            T.StructField("cluster", T.IntegerType()),
        ]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "_id": pdf[id_col],
                    "_vec": pdf[vec_col],
                    "cluster": _sq_dists(mat, centroids)
                    .argmin(axis=1)
                    .astype(np.int32),
                }
            )

    assigned = (
        fan_out(corpus)
        .select(F.col(id_col), vec_col)
        .mapInPandas(assign, schema=cell_schema)
    )

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_id").reset_index(drop=True)
        mat = np.stack(pdf["_vec"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        ids = pdf["_id"].to_numpy()
        kept_rows: list[int] = []
        keep = np.zeros(len(pdf), dtype=bool)
        dup_of = np.full(len(pdf), -1, dtype=np.int64)
        max_sim = np.zeros(len(pdf), dtype=np.float64)
        for i in range(len(pdf)):
            if kept_rows:
                sims = unit[kept_rows] @ unit[i]
                j = int(np.argmax(sims))
                max_sim[i] = sims[j]
                if sims[j] >= threshold:
                    dup_of[i] = ids[kept_rows[j]]
                    continue
            keep[i] = True
            kept_rows.append(i)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cluster": pdf["cluster"],
                "keep": keep,
                "dup_of": pd.array(
                    [None if d < 0 else d for d in dup_of], dtype="Int64"
                ),
                "max_sim": _round_half_up(max_sim),
            }
        )

    return assigned.groupBy("cluster").applyInPandas(prune, schema=_OUT_SCHEMA)


def semantic_dedup_model(
    corpus: DataFrame,
    centroids: list[tuple[int, list[float]]],
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Model-injected, fully SQL-reproducible twin of
    :func:`semantic_dedup` (the r6 ``ivf_topk_model`` recipe): the
    coarse quantizer is a LOADED centroid list (id-ascending), cell
    assignment and every greedy keep/drop decision use the
    6-dp-half-up-rounded cosine with smallest-id tie-breaks — so the
    complete output (cluster, keep, dup_of, max_sim) is reproducible
    in ANSI SQL (recursive CTE over cluster ranks) and carries a full
    driver value-hash oracle.  The k-means-trained production path
    (:func:`semantic_dedup`) keeps its determinism/planted-dup pytest
    gates.

    ``cluster`` in the output is the CENTROID ID (long), not a dense
    index.  Same 100 TB shape as the production path: broadcast model,
    one Arrow assign pass, ONE shuffle on the cell id.
    """
    from atd_data_lake_spark.operators.similarity import (
        _cosine_matrix,
        drop_null_vectors,
    )

    corpus = drop_null_vectors(corpus, vec_col)
    c_ids = np.array([c[0] for c in centroids], dtype=np.int64)
    if not (np.diff(c_ids) > 0).all():
        raise ValueError("centroids must be sorted by id ascending")
    c_mat = np.array([c[1] for c in centroids], dtype=np.float64)

    cell_schema = T.StructType(
        [
            T.StructField("_id", T.LongType()),
            T.StructField("_vec", corpus.schema[vec_col].dataType),
            T.StructField("cluster", T.LongType()),
        ]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            sims = _round_half_up(_cosine_matrix(mat, c_mat))  # n×k
            # argmax first-occurrence == smallest centroid id on ties
            yield pd.DataFrame(
                {
                    "_id": pdf[id_col],
                    "_vec": pdf[vec_col],
                    "cluster": c_ids[np.argmax(sims, axis=1)],
                }
            )

    assigned = (
        fan_out(corpus)
        .select(F.col(id_col), vec_col)
        .mapInPandas(assign, schema=cell_schema)
    )

    out_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("cluster", T.LongType()),
            T.StructField("keep", T.BooleanType()),
            T.StructField("dup_of", T.LongType()),
            T.StructField("max_sim", T.DoubleType()),
        ]
    )

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_id").reset_index(drop=True)
        mat = np.stack(pdf["_vec"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        ids = pdf["_id"].to_numpy()
        kept_rows: list[int] = []
        keep = np.zeros(len(pdf), dtype=bool)
        dup_of = np.full(len(pdf), -1, dtype=np.int64)
        max_sim = np.zeros(len(pdf), dtype=np.float64)
        for i in range(len(pdf)):
            if kept_rows:
                # ROUNDED before every decision — the SQL-parity contract
                sims = _round_half_up(unit[kept_rows] @ unit[i])
                j = int(np.argmax(sims))  # first max == smallest kept id
                max_sim[i] = sims[j]
                if sims[j] >= threshold:
                    dup_of[i] = ids[kept_rows[j]]
                    continue
            keep[i] = True
            kept_rows.append(i)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cluster": pdf["cluster"],
                "keep": keep,
                "dup_of": pd.array(
                    [None if d < 0 else d for d in dup_of], dtype="Int64"
                ),
                "max_sim": max_sim,
            }
        )

    return assigned.groupBy("cluster").applyInPandas(prune, schema=out_schema)
