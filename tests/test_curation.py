"""Dataset-curation operators: determinism, coverage, and scale-shape
properties that the DuckDB oracle cannot express (plan checks,
partitioning invariance, monotone split growth)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from atd_data_lake_spark.io.reader import read_table
from atd_data_lake_spark.operators.curation import (
    cap_per_source,
    chunk_documents,
    decontaminate,
    hash_u16,
    pack_chunks,
    quality_gate_percentile,
    split_dataset,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return read_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )


def test_split_fractions_validated(docs):
    with pytest.raises(ValueError):
        split_dataset(docs, fractions={"train": 0.5, "val": 0.1})


def test_split_deterministic_across_partitionings(docs):
    a = split_dataset(docs.repartition(1), key_col="doc_id")
    b = split_dataset(docs.repartition(7), key_col="doc_id")
    ra = {r["doc_id"]: r["split"] for r in a.collect()}
    rb = {r["doc_id"]: r["split"] for r in b.collect()}
    assert ra == rb
    assert set(ra.values()) == {"train", "val", "test"}


def test_split_monotone_under_fraction_growth(docs):
    """Growing train 0.8 → 0.9 only ever moves docs INTO train — the
    threshold property that makes hash splits safe to re-cut."""
    small = split_dataset(docs, fractions={"train": 0.8, "rest": 0.2})
    big = split_dataset(docs, fractions={"train": 0.9, "rest": 0.1})
    s = {r["doc_id"] for r in small.filter(F.col("split") == "train").collect()}
    b = {r["doc_id"] for r in big.filter(F.col("split") == "train").collect()}
    assert s <= b


def test_split_salt_rerolls(docs):
    a = {
        r["doc_id"]: r["split"]
        for r in split_dataset(docs, salt="v1").collect()
    }
    b = {
        r["doc_id"]: r["split"]
        for r in split_dataset(docs, salt="v2").collect()
    }
    assert a != b  # some doc moved (overwhelmingly likely at n>=100)


def test_split_is_zero_shuffle(docs):
    plan = (
        split_dataset(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_stratified_sample_deterministic_and_bounded(docs):
    frac = {"en": 0.25, "de": 1.0, "es": 0.5, "zh": 0.75}
    a = stratified_sample(docs, "lang", frac, default_fraction=0.1)
    b = stratified_sample(docs.repartition(5), "lang", frac, default_fraction=0.1)
    ia = sorted(r["doc_id"] for r in a.collect())
    assert ia == sorted(r["doc_id"] for r in b.collect())
    totals = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = {r["lang"]: r["n"] for r in a.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert kept.get("de", 0) == totals["de"]  # fraction 1.0 keeps all


def test_stratified_sample_validates_fractions(docs):
    with pytest.raises(ValueError):
        stratified_sample(docs, "lang", {"en": 1.5})


def test_hash_u16_range(spark):
    df = spark.range(2000).select(hash_u16(F.col("id")).alias("v"))
    lo, hi = df.agg(F.min("v"), F.max("v")).first()
    assert 0 <= lo and hi < 65536
    # roughly uniform: all four quartiles populated
    q = df.select((F.col("v") / 16384).cast("int").alias("q")).groupBy("q").count()
    assert q.count() == 4


def test_decontaminate_flags_benchmark_members(docs):
    bench = docs.filter(F.col("doc_id") % 20 == 0).select("doc_id", "text")
    rep = decontaminate(docs.select("doc_id", "text"), bench, n=3)
    rows = {r["doc_id"]: r for r in rep.collect()}
    # every benchmark doc with >= 3 tokens overlaps itself 100%
    for did, r in rows.items():
        if did % 20 == 0:
            assert r["contam_ratio"] == 1.0 and r["is_contaminated"]
    # and someone outside the benchmark is clean
    assert any(
        not r["is_contaminated"] for did, r in rows.items() if did % 20
    )


def test_decontaminate_broadcasts_benchmark_not_corpus(docs):
    bench = docs.filter(F.col("doc_id") % 20 == 0).select("doc_id", "text")
    plan = (
        decontaminate(docs.select("doc_id", "text"), bench, n=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_chunk_documents_covers_every_token(docs):
    sample = docs.select("doc_id", "text").limit(50)
    chunks = chunk_documents(sample, chunk_tokens=64, stride=48).collect()
    texts = {r["doc_id"]: r["text"] for r in sample.collect()}
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for did, text in texts.items():
        toks = text.split()
        rows = sorted(by_doc[did], key=lambda r: r["chunk_id"])
        # chunk 0 starts at token 0; consecutive chunks advance by stride
        rebuilt = []
        for r in rows:
            start = r["chunk_id"] * 48
            assert r["chunk_text"].split() == toks[start : start + 64]
            assert r["n_chunk_tokens"] == len(toks[start : start + 64])
            rebuilt.extend(toks[start : start + 64])
        assert set(rebuilt) == set(toks)
        # no chunk beyond the last needed one
        n = len(toks)
        expected = 1 + max(0, -(-(max(n - 64, 0)) // 48))
        assert len(rows) == expected


def test_chunk_documents_validates_params(docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=10, stride=20)
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=0, stride=0)


def test_pack_chunks_contiguous_and_bounded(spark):
    rows = [
        ("s1", i, 0, t)
        for i, t in enumerate([100, 300, 200, 512, 10, 50])
    ] + [("s2", i, 0, 512) for i in range(3)]
    df = spark.createDataFrame(
        rows, "source string, doc_id long, chunk_id long, n_chunk_tokens long"
    )
    out = pack_chunks(df, context_tokens=512).collect()
    by = {(r["source"], r["doc_id"]): r for r in out}
    # s1 running starts: 0,100,400,600,1112,1122 → packs 0,0,0,1,2,2
    assert [by[("s1", i)]["pack_id"] for i in range(6)] == [0, 0, 0, 1, 2, 2]
    # exactly-full chunks start each pack in s2
    assert [by[("s2", i)]["pack_id"] for i in range(3)] == [0, 1, 2]
    # pack ids are per-source: both sources have a pack 0
    with pytest.raises(ValueError):
        pack_chunks(df, context_tokens=0)


def test_cap_per_source_deterministic(docs, spark, sf_dir):
    d = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    a = sorted(r["doc_id"] for r in cap_per_source(d, max_per_source=5).collect())
    b = sorted(
        r["doc_id"]
        for r in cap_per_source(d.repartition(9), max_per_source=5).collect()
    )
    assert a == b
    counts = (
        cap_per_source(d, max_per_source=5)
        .groupBy("source")
        .count()
        .collect()
    )
    assert all(r["count"] <= 5 for r in counts)


def test_quality_gate_drops_bottom_decile_per_group(spark):
    rows = [("en", i, i * 10) for i in range(20)] + [
        ("de", i + 100, i) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "lang string, doc_id long, m long")
    out = quality_gate_percentile(
        df, metric_col="m", group_col="lang", min_percentile=0.2
    ).collect()
    en = sorted(r["m"] for r in out if r["lang"] == "en")
    de = sorted(r["m"] for r in out if r["lang"] == "de")
    # percent_rank = (rank-1)/(n-1); >= 0.2 keeps ranks where
    # (i)/(19) >= .2 → i >= 3.8 → m >= 40 for en, i/9 >= .2 → m >= 2
    assert en[0] == 40 and de[0] == 2
    with pytest.raises(ValueError):
        quality_gate_percentile(df, metric_col="m", min_percentile=1.0)


def test_chunk_documents_zero_shuffle(docs):
    plan = (
        chunk_documents(docs.select("doc_id", "text"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_token_budget_per_source(spark):
    from atd_data_lake_spark.operators.curation import token_budget_per_source

    docs = spark.createDataFrame(
        [
            (1, "a", "w w w w"),        # 4 tokens
            (2, "a", "w w w w w w"),    # 6 tokens (longest → first)
            (3, "a", "w w w"),          # 3 tokens
            (4, "b", "w w w w w w w w w w w w"),  # 12 tokens > budget alone
            (5, "b", "w"),
        ],
        "doc_id long, source string, text string",
    )
    out = token_budget_per_source(docs, budget_tokens=10)
    rows = {r["doc_id"]: (r["n_tokens"], r["cum_tokens"]) for r in out.collect()}
    # source a: 6 (doc2) then 4 (doc1) = 10 ≤ 10; doc3 would hit 13 → out
    # source b: doc4 alone is 12 > 10 → excluded; doc5 ranks after doc4 so
    # its cumulative (13) is over budget too — greedy is rank-ordered, not
    # best-fit (documented)
    assert rows == {2: (6, 6), 1: (4, 10)}

    # equal lengths: doc_id asc breaks the tie deterministically
    ties = spark.createDataFrame(
        [(9, "c", "w w"), (8, "c", "w w"), (7, "c", "w w")],
        "doc_id long, source string, text string",
    )
    kept = sorted(r["doc_id"] for r in token_budget_per_source(ties, budget_tokens=4).collect())
    assert kept == [7, 8]
