"""Unit/property tests for the round-5 operators: centroid assignment,
SCD2 interval pack, n-gram containment, Morton layout key.  (Oracle
parity for the registered queries lives in test_oracle_parity.py.)
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# pack_intervals
# ---------------------------------------------------------------------------


def test_pack_intervals_runs_and_invariants(spark):
    from atd_data_lake_spark.operators.windows import pack_intervals

    rows = [
        # user 1: A A B A  -> three runs (A x2, B x1, A x1)
        (1, "2024-01-01T00:00:00", "A", 1),
        (1, "2024-01-01T01:00:00", "A", 2),
        (1, "2024-01-01T02:00:00", "B", 3),
        (1, "2024-01-01T03:00:00", "A", 4),
        # user 2: single run of B
        (2, "2024-01-01T00:30:00", "B", 5),
        (2, "2024-01-01T09:00:00", "B", 6),
    ]
    df = spark.createDataFrame(
        [Row(user_id=u, ts=t, event_type=s, event_id=i) for u, t, s, i in rows]
    ).withColumn("ts", F.to_timestamp("ts"))
    out = pack_intervals(
        df, "user_id", "ts", "event_type", tiebreak=["event_id"]
    ).orderBy("user_id", "valid_from")
    got = [(r.user_id, r.event_type, r.n_rows) for r in out.collect()]
    assert got == [(1, "A", 2), (1, "B", 1), (1, "A", 1), (2, "B", 2)]
    # intervals cover every input row exactly once
    assert sum(r[2] for r in got) == len(rows)
    # within a user, intervals are disjoint and ordered
    per_user = out.filter(F.col("user_id") == 1).collect()
    for a, b in zip(per_user, per_user[1:]):
        assert a.valid_to <= b.valid_from


def test_pack_intervals_tie_determinism(spark):
    """Equal timestamps: the event_id tiebreak pins run boundaries, so
    repartitioned input yields the identical interval set."""
    from atd_data_lake_spark.operators.windows import pack_intervals

    rows = [
        Row(user_id=1, ts="2024-01-01T00:00:00", event_type=s, event_id=i)
        for i, s in enumerate(["A", "B", "A", "B", "B", "A"])
    ]
    df = spark.createDataFrame(rows).withColumn("ts", F.to_timestamp("ts"))
    a = pack_intervals(df, "user_id", "ts", "event_type", tiebreak=["event_id"])
    b = pack_intervals(
        df.repartition(7), "user_id", "ts", "event_type", tiebreak=["event_id"]
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# ---------------------------------------------------------------------------
# ngram_containment_pairs
# ---------------------------------------------------------------------------


def test_containment_catches_wrapper_jaccard_misses(spark):
    """A short doc quoted whole inside a long doc: containment ~1.0 for
    the short side while Jaccard is far below any dedup threshold."""
    from atd_data_lake_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "the quick brown fox jumps over the lazy dog"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    long_doc = filler + " " + short + " " + " ".join(f"z{i} q{i}" for i in range(40))
    df = spark.createDataFrame(
        [Row(doc_id=1, text=short), Row(doc_id=2, text=long_doc)]
    )
    cont = ngram_containment_pairs(df, n=3, threshold=0.9).collect()
    assert len(cont) == 1
    assert cont[0].cont_a_in_b >= 0.99  # short fully inside long
    assert cont[0].cont_b_in_a < 0.2
    jac = ngram_jaccard_pairs(df, n=3, threshold=0.3).collect()
    assert jac == []  # Jaccard structurally misses the wrapper pair


def test_containment_symmetric_identical_docs(spark):
    from atd_data_lake_spark.operators.dedup import ngram_containment_pairs

    t = "alpha beta gamma delta epsilon zeta"
    df = spark.createDataFrame([Row(doc_id=1, text=t), Row(doc_id=2, text=t)])
    out = ngram_containment_pairs(df, n=3, threshold=0.5).collect()
    assert len(out) == 1
    assert out[0].cont_a_in_b == 1.0 and out[0].cont_b_in_a == 1.0


# ---------------------------------------------------------------------------
# morton_key_8x8
# ---------------------------------------------------------------------------


def test_morton_key_bijective_and_ordered(spark):
    """The 16-bit Morton key is a bijection on (0..255)x(0..255) sampled
    here on a grid, and matches the reference bit-interleave."""
    from atd_data_lake_spark.operators.layout import morton_key_8x8

    def ref_morton(x: int, y: int) -> int:
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    pts = [(x, y) for x in range(0, 256, 17) for y in range(0, 256, 13)]
    df = spark.createDataFrame([Row(x=x, y=y) for x, y in pts])
    out = df.select(
        "x", "y", morton_key_8x8(F.col("x"), F.col("y")).alias("z")
    ).collect()
    got = {(r.x, r.y): r.z for r in out}
    for (x, y), z in got.items():
        assert z == ref_morton(x, y), (x, y)
    assert len(set(got.values())) == len(pts)  # injective on the sample


def test_morton_locality_beats_linear_on_y(spark):
    """Layout-quality smoke: bucketing rows into equal-size files by
    z-key yields per-file envelopes that are tight on BOTH dims, whereas
    x-major ordering leaves y wide open.  (This is the property the
    evt_zorder_audit query reports on real data.)"""
    from atd_data_lake_spark.operators.layout import morton_key_8x8

    pts = [Row(x=x, y=y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(pts).select(
        "x", "y", morton_key_8x8(F.col("x"), F.col("y")).alias("z")
    )
    n_files = 16
    # file id = rank bucket over the ordering key
    from pyspark.sql import Window

    for key, dim in (("z", "y"), ("x", "y")):
        w = Window.orderBy(key, "x", "y")
        spans = (
            df.withColumn("_rn", F.row_number().over(w) - 1)
            .withColumn("_file", (F.col("_rn") / (4096 / n_files)).cast("int"))
            .groupBy("_file")
            .agg((F.max(dim) - F.min(dim)).alias("span"))
            .agg(F.avg("span").alias("avg_span"))
            .collect()[0]
        )
        if key == "z":
            z_span = spans.avg_span
        else:
            x_span = spans.avg_span
    assert z_span < x_span / 2, (z_span, x_span)


# ---------------------------------------------------------------------------
# centroid_assign
# ---------------------------------------------------------------------------


def test_centroid_assign_nearest_and_tiebreak(spark):
    from atd_data_lake_spark.operators.similarity import centroid_assign

    centroids = [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [1.0, 0.0])]
    df = spark.createDataFrame(
        [
            Row(vec_id=10, embedding=[0.9, 0.1]),   # nearest: x-axis; tie 0 vs 2 -> 0
            Row(vec_id=11, embedding=[0.1, 0.9]),   # nearest: y-axis -> 1
            Row(vec_id=12, embedding=[0.0, 0.0]),   # zero vector -> centroid 0, sim 0
        ]
    )
    out = {r.vec_id: r for r in centroid_assign(df, centroids).collect()}
    assert out[10].centroid_id == 0 and out[10].cos_sim > 0.99
    assert out[11].centroid_id == 1
    assert out[12].centroid_id == 0 and out[12].cos_sim == 0.0


def test_centroid_assign_plan_is_shuffle_free(spark):
    """The model rides in the expression; assignment must add no Exchange."""
    from atd_data_lake_spark.operators.similarity import centroid_assign

    df = spark.range(100).select(
        F.col("id").alias("vec_id"),
        F.array(F.rand(seed=1), F.rand(seed=2)).alias("embedding"),
    )
    plan = centroid_assign(df, [(0, [1.0, 0.0]), (1, [0.0, 1.0])])._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# mixture_resample
# ---------------------------------------------------------------------------


def test_mixture_resample_binding_source_and_determinism(spark):
    from atd_data_lake_spark.operators.curation import mixture_resample

    rows = [
        Row(doc_id=i, source=("a" if i < 40 else "b" if i < 60 else "c"))
        for i in range(100)
    ]
    df = spark.createDataFrame(rows)  # a: 40, b: 20, c: 40
    # target 2:1:1 -> scale = min(40/2, 20/1, 40/1) = 20 -> keep a: 40,
    # b: 20 (binding, 100%), c: 20
    out = mixture_resample(df, {"a": 2.0, "b": 1.0, "c": 1.0})
    got = {r.source: 0 for r in out.collect()}
    rows_out = out.collect()
    from collections import Counter

    c = Counter(r.source for r in rows_out)
    assert c["a"] == 40 and c["b"] == 20  # thresholds hit 65536 exactly
    assert 10 <= c["c"] <= 30  # hash-thresholded ~50% of 40
    # partition-count invariance: identical kept set
    out2 = mixture_resample(df.repartition(13), {"a": 2.0, "b": 1.0, "c": 1.0})
    assert sorted(map(tuple, rows_out)) == sorted(map(tuple, out2.collect()))
    # unlisted source is dropped entirely
    out3 = mixture_resample(df, {"a": 1.0, "b": 1.0})
    assert {r.source for r in out3.collect()} == {"a", "b"}


def test_mixture_resample_weight_increase_only_adds(spark):
    """Raising one source's weight must never evict a previously kept
    doc of that source (threshold monotonicity)."""
    from atd_data_lake_spark.operators.curation import mixture_resample

    rows = [
        Row(doc_id=i, source=("a" if i % 2 == 0 else "b")) for i in range(200)
    ]
    df = spark.createDataFrame(rows)
    lo = {("a"): 1.0, "b": 1.0}
    hi = {("a"): 3.0, "b": 1.0}
    kept_lo = {r.doc_id for r in mixture_resample(df, lo).collect() if r.source == "a"}
    kept_hi = {r.doc_id for r in mixture_resample(df, hi).collect() if r.source == "a"}
    assert kept_lo <= kept_hi
