"""Operator-level tests for the round-3 additions: PII scrubbing,
keep-best-per-cluster, semantic dedup, and the event funnel."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------------


def test_scrub_pii_all_categories(spark):
    from atd_data_lake_spark.operators.pii import pii_counts, scrub_pii

    df = spark.createDataFrame(
        [
            ("reach me at jo.doe+x@mail.example.org or 512-555-0147", 1, 1, 0),
            ("server 192.168.001.1 and 10.0.0.255 responded", 0, 0, 2),
            ("no pii here, just 3.14 and v1.2.3-rc1", 0, 0, 0),
            ("a@b.co", 1, 0, 0),
        ],
        "text string, e int, p int, i int",
    )
    c = pii_counts("text")
    got = df.select(
        c["n_emails"].alias("ge"),
        c["n_phones"].alias("gp"),
        c["n_ips"].alias("gi"),
        scrub_pii("text").alias("s"),
        "e",
        "p",
        "i",
    ).collect()
    for r in got:
        assert (r.ge, r.gp, r.gi) == (r.e, r.p, r.i), r.s
        assert "@" not in r.s or "<EMAIL>" in r.s
    scrubbed = {r.s for r in got}
    assert "reach me at <EMAIL> or <PHONE>" in scrubbed
    assert "server <IP> and <IP> responded" in scrubbed
    assert "no pii here, just 3.14 and v1.2.3-rc1" in scrubbed


def test_scrub_pii_email_before_ip_ordering(spark):
    """A digit-dotted email domain must scrub as ONE email, not get its
    interior shredded by the IPv4 pattern."""
    from atd_data_lake_spark.operators.pii import scrub_pii

    df = spark.createDataFrame(
        [("mail x@10.0.0.1.example.com end", "mail <EMAIL> end"),
         ("bare x@1.2.3.4 end", "bare x@<IP> end")],  # no alpha TLD → not an email
        "text string, want string",
    )
    for r in df.select(scrub_pii("text").alias("s"), "want").collect():
        assert r.s == r.want


# ---------------------------------------------------------------------------
# keep_best_per_cluster
# ---------------------------------------------------------------------------


def test_keep_best_prefers_quality_then_min_id(spark):
    from atd_data_lake_spark.operators.curation import keep_best_per_cluster

    clusters = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (7, 200), (8, 200)],
        "doc_id long, component long",
    )
    quality = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9), (7, 0.1), (8, 0.1)],
        "doc_id long, quality double",
    )
    got = {
        r.cluster_id: (r.kept_id, r.kept_quality, r.n_members)
        for r in keep_best_per_cluster(clusters, quality).collect()
    }
    # cluster 100: 2 and 3 tie on quality → min id wins
    assert got == {100: (2, 0.9, 3), 200: (7, 0.1, 2)}


# ---------------------------------------------------------------------------
# semantic_dedup
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_semantic_dedup_invariant_and_counts(spark, emb):
    """Every vector appears exactly once; within a cluster no two KEPT
    vectors have cosine ≥ threshold; every dropped vector names a kept
    earlier-id member it duplicates."""
    from atd_data_lake_spark.operators.semdedup import semantic_dedup

    thr = 0.9
    out = semantic_dedup(emb, n_clusters=8, threshold=thr).collect()
    assert len(out) == emb.count()
    vecs = {r.vec_id: np.array(r.embedding, float) for r in emb.collect()}

    kept_by_cluster: dict[int, list[int]] = {}
    kept_ids = {r.vec_id for r in out if r.keep}
    for r in out:
        if r.keep:
            assert r.dup_of is None
            kept_by_cluster.setdefault(r.cluster, []).append(r.vec_id)
        else:
            assert r.dup_of in kept_ids and r.dup_of < r.vec_id
            assert r.max_sim >= thr

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return float(a @ b / ((na or 1.0) * (nb or 1.0)))

    for members in kept_by_cluster.values():
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                assert cos(vecs[a], vecs[b]) < thr


def test_semantic_dedup_deterministic_across_partitionings(spark, emb):
    from atd_data_lake_spark.operators.semdedup import semantic_dedup

    r1 = sorted(map(tuple, semantic_dedup(emb, n_clusters=8).collect()))
    r2 = sorted(
        map(tuple, semantic_dedup(emb.repartition(13), n_clusters=8).collect())
    )
    assert r1 == r2


def test_semantic_dedup_drops_planted_duplicate(spark):
    from atd_data_lake_spark.operators.semdedup import semantic_dedup

    base = [float(x) for x in range(1, 9)]
    near = [v * 1.0001 for v in base]  # cos ≈ 1
    far = [float(x) for x in [9, -3, 7, -1, 2, -8, 4, -6]]
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "vec_id long, embedding array<double>"
    )
    rows = {r.vec_id: r for r in semantic_dedup(df, n_clusters=2).collect()}
    assert rows[1].keep and rows[3].keep
    assert not rows[2].keep and rows[2].dup_of == 1


# ---------------------------------------------------------------------------
# funnel
# ---------------------------------------------------------------------------


def test_evt_funnel_stages(spark, sf_dir):
    """Stage flags are consistent: stage 3 ⇒ click and purchase present
    and strictly ordered signup < click < purchase; converted_1h ⇒
    purchase within one hour of the click."""
    from atd_data_lake_spark.analytics_queries import evt_funnel

    rows = evt_funnel(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.stage == 1:
            assert r.first_click is None and r.first_purchase is None
        if r.stage == 2:
            assert r.first_click is not None and r.first_purchase is None
        if r.stage == 3:
            assert r.signup_ts < r.first_click < r.first_purchase
        if r.converted_1h:
            assert (r.first_purchase - r.first_click).total_seconds() <= 3600


def test_unigram_logprob_empty_doc_and_ordering(spark):
    """Empty docs survive with n_tokens=0/null score; docs made of rarer
    tokens score strictly lower than docs of common tokens."""
    from atd_data_lake_spark.operators.text import unigram_logprob_score

    df = spark.createDataFrame(
        [
            (1, "the the the the"),
            (2, "the the zzyzx the"),
            (3, "   "),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in unigram_logprob_score(df).collect()}
    assert rows[3].n_tokens == 0 and rows[3].mean_logprob is None
    assert rows[1].n_tokens == 4 and rows[2].n_tokens == 4
    assert rows[2].mean_logprob < rows[1].mean_logprob


def test_asof_tolerance_bounds_matches(spark):
    """With a tolerance, right rows outside the window never match even
    when direction-eligible."""
    from atd_data_lake_spark.operators.asof import asof_join
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [("a", "2024-01-01 10:00:00")], "k string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [("a", "2024-01-01 10:30:00"), ("a", "2024-01-03 00:00:00")],
        "k string, rts string",
    ).withColumn("rts", F.col("rts").cast("timestamp"))

    hit = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        direction="forward", tolerance=F.expr("INTERVAL 1 HOUR"),
    ).first()
    assert str(hit.rts) == "2024-01-01 10:30:00"

    miss = asof_join(
        left, right.filter(F.col("rts") > "2024-01-02"),
        on=["k"], left_ts="ts", right_ts="rts",
        direction="forward", tolerance=F.expr("INTERVAL 1 HOUR"),
    ).first()
    assert miss.rts is None


def test_maintain_daily_aggregate_touches_only_batch_days(spark):
    """Incrementality proof: a (deliberately wrong) standing row for an
    untouched day passes through BYTE-identical — the maintenance never
    recomputes days absent from the batch — while batch days are rebuilt
    from the batch alone."""
    from atd_data_lake_spark.operators.incremental import maintain_daily_aggregate

    standing = spark.createDataFrame(
        [("2024-01-01", 999), ("2024-01-02", 5)], "day string, n long"
    ).withColumn("day", F.col("day").cast("date"))
    batch = spark.createDataFrame(
        [("2024-01-02 10:00:00",)] * 3, "ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    def build_agg(df):
        return df.groupBy(F.to_date("ts").alias("day")).agg(
            F.count("*").alias("n")
        )

    got = {
        str(r.day): r.n
        for r in maintain_daily_aggregate(standing, batch, build_agg).collect()
    }
    assert got == {"2024-01-01": 999, "2024-01-02": 3}


def test_approx_sketches_within_error_bounds(spark, sf_dir):
    """The rows-only sketch query's estimates must land within the
    published error bounds of the exact aggregates, and be deterministic
    across runs (hash-based sketches, no RNG)."""
    from pyspark.sql import functions as F

    from atd_data_lake_spark.queries import QUERIES

    approx = {
        r["event_type"]: r
        for r in QUERIES["agg_approx_sketches"](spark, sf_dir).collect()
    }
    again = {
        r["event_type"]: r
        for r in QUERIES["agg_approx_sketches"](spark, sf_dir).collect()
    }
    assert approx.keys() == again.keys()
    for k in approx:
        assert tuple(approx[k]) == tuple(again[k])  # deterministic

    from atd_data_lake_spark.io.reader import read_table

    exact = {
        r["event_type"]: r
        for r in read_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.95)").alias("p95"),
        )
        .collect()
    }
    for k, a in approx.items():
        e = exact[k]
        # HLL++ rsd 0.05 → generous 4-sigma bound
        assert abs(a["approx_users"] - e["users"]) <= max(3, 0.2 * e["users"])
        # percentile_approx with accuracy 10k on these group sizes is
        # near-exact; allow a loose relative band
        assert abs(a["p50"] - e["p50"]) <= max(1.0, 0.05 * abs(e["p50"]))
        assert abs(a["p95"] - e["p95"]) <= max(1.0, 0.05 * abs(e["p95"]))
