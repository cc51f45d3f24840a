"""IVF index persistence: the 100 TB ANN-serving layout.

`ivf_topk` assigns corpus vectors to coarse cells in-flight; at serving
scale the assignment is paid ONCE by writing the corpus partitioned by
cell, after which every query's probe set becomes a partition-pruned
scan — only n_probe/n_cells of the files are ever opened.  These tests
prove the layout end-to-end on the real operator internals: the write
produces one directory per cell, the probe read plans PartitionFilters
(not a full scan), and the pruned path returns exactly the same
neighbors as the in-flight operator.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from atd_data_lake_spark.io.reader import read_table
from atd_data_lake_spark.operators.similarity import (
    _kmeans_centroids,
    _sq_dists,
    ivf_topk,
)

N_CELLS = 8
N_PROBE = 2


@pytest.fixture(scope="module")
def ivf_layout(spark, sf_dir, tmp_path_factory):
    """Write embeddings partitioned by IVF cell; return (path, centroids)."""
    emb = read_table(spark, sf_dir, "embeddings")
    sample = np.array(
        [r[0] for r in emb.orderBy("vec_id").select("embedding").limit(2048).collect()],
        dtype=np.float64,
    )
    centroids = _kmeans_centroids(sample, N_CELLS, seed=42)

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", emb.schema["embedding"].dataType),
            T.StructField("cell", T.IntegerType()),
        ]
    )

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "embedding": pdf["embedding"],
                    "cell": _sq_dists(mat, centroids).argmin(axis=1).astype(np.int32),
                }
            )

    path = str(tmp_path_factory.mktemp("ivf") / "emb_by_cell")
    (
        emb.select("vec_id", "embedding")
        .mapInPandas(assign, schema=schema)
        .write.partitionBy("cell")
        .mode("overwrite")
        .parquet(path)
    )
    return path, centroids


def test_layout_one_directory_per_cell(ivf_layout):
    import os

    path, _ = ivf_layout
    cells = sorted(
        int(d.split("=")[1]) for d in os.listdir(path) if d.startswith("cell=")
    )
    assert cells == list(range(N_CELLS))


def test_probe_read_is_partition_pruned(spark, ivf_layout):
    path, _ = ivf_layout
    probed = spark.read.parquet(path).filter(F.col("cell").isin([1, 3]))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    # the pruned scan must actually read fewer rows than the table
    total = spark.read.parquet(path).count()
    assert 0 < probed.count() < total


def test_pruned_path_matches_inflight_operator(spark, sf_dir, ivf_layout):
    """Scoring candidates from the PRUNED partitioned read returns the
    same top-k as the in-flight ivf_topk with identical geometry."""
    path, centroids = ivf_layout
    emb = read_table(spark, sf_dir, "embeddings")
    queries = (
        emb.orderBy("vec_id")
        .limit(5)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    expected = {
        (r.query_id, r.rank): r.neighbor_id
        for r in ivf_topk(
            emb, queries, k=5, n_cells=N_CELLS, n_probe=N_PROBE, seed=42
        ).collect()
    }

    # pruned path: probe cells per query from the same centroids, read
    # ONLY those partitions, exact-cosine re-rank
    qrows = queries.collect()
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)
    probes = np.argsort(_sq_dists(qmat, centroids), axis=1)[:, :N_PROBE]
    got = {}
    for i, qr in enumerate(qrows):
        cells = [int(c) for c in probes[i]]
        cand = (
            spark.read.parquet(path)
            .filter(F.col("cell").isin(cells))
            .filter(F.col("vec_id") != int(qr[0]))
            .collect()
        )
        ids = np.array([r.vec_id for r in cand])
        mat = np.array([r.embedding for r in cand], dtype=np.float64)
        qv = qmat[i]
        sims = (mat @ qv) / (
            np.linalg.norm(mat, axis=1) * np.linalg.norm(qv) + 1e-12
        )
        sims = np.round(sims, 6)
        order = np.lexsort((ids, -sims))[:5]
        for rank, j in enumerate(order, start=1):
            got[(int(qr[0]), rank)] = int(ids[j])
    assert got == expected
