"""Round-14 targeted tests: PCA projection properties (the rows-only
op); the three oracle-backed queries are covered by test_oracle_parity
automatically, plus a weighted-sampling bias property here."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from atd_data_lake_spark.round14_queries import (
    _pca_components,
    cur_weighted_sample,
    emb_pca_project,
    emb_pca_project_trained,
)


def test_pca_components_orthonormal_and_sign_pinned():
    rng = np.random.default_rng(3)
    X = rng.normal(size=(500, 16)) @ np.diag(np.linspace(3, 0.1, 16))
    mean, comps, vals = _pca_components(X)
    assert comps.shape == (8, 16)
    # orthonormal rows
    g = comps @ comps.T
    assert np.allclose(g, np.eye(8), atol=1e-9)
    # variance-ordered
    assert all(vals[i] >= vals[i + 1] for i in range(len(vals) - 1))
    # sign pin: the largest-|.| entry of each component is positive
    for row in comps:
        assert row[int(np.argmax(np.abs(row)))] > 0


def test_pca_projection_partition_invariant(spark, sf_dir):
    base = sorted(map(tuple, emb_pca_project(spark, sf_dir).collect()))
    # projection is trained on a driver-side sample and applied
    # row-wise, so any input partitioning must give identical output
    from atd_data_lake_spark.io.reader import read_table

    assert len(base) > 0
    again = sorted(map(tuple, emb_pca_project(spark, sf_dir).collect()))
    assert base == again


def test_pca_first_component_captures_most_variance(spark, sf_dir):
    # the TRAINED path (real eigensolve) orders components by variance;
    # the registered query is the model-injected twin, which doesn't
    rows = emb_pca_project_trained(spark, sf_dir).collect()
    P = np.array([[r[f"p{i}"] for i in range(8)] for r in rows])
    v = P.var(axis=0)
    assert v[0] == max(v)


def test_pca_trained_partition_invariant(spark, sf_dir):
    base = sorted(map(tuple, emb_pca_project_trained(spark, sf_dir).collect()))
    assert len(base) > 0
    again = sorted(map(tuple, emb_pca_project_trained(spark, sf_dir).collect()))
    assert base == again


def test_weighted_sample_favors_heavy_docs(spark, sf_dir):
    """A-ES with weight = n_chars must over-represent long documents:
    the sampled mean n_chars exceeds the corpus mean."""
    from atd_data_lake_spark.io.reader import read_table

    samp = cur_weighted_sample(spark, sf_dir)
    samp_mean = samp.agg(F.avg("n_chars")).first()[0]
    corpus_mean = (
        read_table(spark, sf_dir, "documents").agg(F.avg("n_chars")).first()[0]
    )
    assert samp_mean > corpus_mean
