"""Unit tests for the plan accounting in ``plancheck.py`` — the counters
behind the exchange-budget gate and PLANS.md.  They must mirror what the
runtime actually materializes: persisted frames once per cache identity
(CacheManager even dedups two persists of the same canonical plan), and
canonically-equal exchanges once (AQE stage reuse / ReuseExchange).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from atd_data_lake_spark.plancheck import (
    count_exchanges,
    count_python_stages,
    dedupe_cached,
)


def test_plain_groupby_is_one_exchange(spark):
    q = spark.range(1000).selectExpr("id % 3 as g", "id").groupBy("g").agg(
        F.sum("id")
    )
    assert count_exchanges(q) == 1


def test_orderby_adds_a_range_exchange(spark):
    q = (
        spark.range(1000)
        .selectExpr("id % 3 as g", "id")
        .groupBy("g")
        .agg(F.sum("id").alias("s"))
        .orderBy("g")
    )
    assert count_exchanges(q) == 2


def test_cached_frame_referenced_twice_counts_once(spark):
    a = (
        spark.range(1000)
        .selectExpr("id", "id % 7 as k")
        .groupBy("k")
        .count()
        .cache()
    )
    try:
        a.count()
        j = a.join(a.selectExpr("k as k2"), F.col("k") == F.col("k2"))
        # one materialized shuffle (the cache), broadcast join on top
        assert count_exchanges(j) == 1
    finally:
        a.unpersist()


def test_duplicated_subtree_union_counts_once(spark):
    """Catalyst duplicates the agg subtree under each union branch; AQE
    stage reuse materializes the canonical exchange once — so must we."""
    g = (
        spark.range(1000)
        .selectExpr("id % 3 as g", "id")
        .groupBy("g")
        .agg(F.sum("id").alias("s"))
    )
    u = g.filter("s > 0").unionByName(g.filter("s < 0"))
    assert count_exchanges(u) == 1


def test_two_distinct_caches_count_separately(spark):
    a = (
        spark.range(1000)
        .selectExpr("id", "id % 7 as k")
        .groupBy("k")
        .count()
        .cache()
    )
    c = (
        spark.range(1000)
        .selectExpr("id", "id % 5 as k")
        .groupBy("k")
        .count()
        .cache()
    )
    try:
        a.count()
        c.count()
        assert count_exchanges(a.join(c, "k")) == 2
    finally:
        a.unpersist()
        c.unpersist()


def test_python_stage_counted_once_across_consumers(spark):
    """A mapInPandas frame persisted once and read by two join sides is
    ONE runtime Python stage."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.LongType())]
    )

    def op(batches):
        for pdf in batches:
            yield pd.DataFrame({"id": pdf["id"], "v": pdf["id"] * 2})

    base = spark.range(100).mapInPandas(op, schema=schema).persist()
    try:
        base.count()
        j = base.join(
            base.selectExpr("id as id2", "v as v2"),
            F.col("v") == F.col("id2"),
        )
        assert count_python_stages(j) == 1
        # while base is persisted, an identical-plan raw frame gets
        # cache-SUBSTITUTED by CacheManager — still one stage
        raw = spark.range(100).mapInPandas(op, schema=schema)
        j2 = raw.join(
            raw.selectExpr("id as id2", "v as v2"),
            F.col("v") == F.col("id2"),
        )
        assert count_python_stages(j2) == 1
    finally:
        base.unpersist()
    # un-persisted duplicated lineage: Spark has NO stage reuse for map
    # stages (only ReuseExchange), so the duplicated Arrow subtree
    # genuinely runs twice and must count twice
    raw = spark.range(100).mapInPandas(op, schema=schema)
    j3 = raw.join(
        raw.selectExpr("id as id2", "v as v2"),
        F.col("v") == F.col("id2"),
    )
    assert count_python_stages(j3) == 2


def test_dedupe_cached_threads_seen_through_recursion():
    """A nested cache printed under two distinct outer caches appears
    once — the seen set must thread through the recursive call."""
    inner = [
        "      +- InMemoryRelation [b#9]",
        "            +- Exchange hashpartitioning(b#9, 8)",
    ]
    outer_a = [
        "+- InMemoryRelation [a#1]",
        "      +- Project [a#1]",
    ] + inner
    outer_b = [
        "+- InMemoryRelation [a#2]",
        "      +- Filter (a#2 > 0)",
    ] + inner
    plan = "\n".join(["Top"] + outer_a + outer_b)
    out = dedupe_cached(plan)
    # the inner cache's Exchange line survives exactly once
    assert out.count("hashpartitioning(b#") == 1


def test_equal_shuffle_under_two_distinct_caches_counts_per_cache(spark):
    """ADVICE r5: exchange reuse lives inside ONE physical plan — each
    cache materializes in its own job, so a canonically-equal shuffle
    under two DIFFERENT cached-plan roots executes twice and must count
    twice (the global semanticHash seen-set undercounted this)."""
    g = (
        spark.range(1000)
        .selectExpr("id % 7 as k", "id")
        .groupBy("k")
        .agg(F.sum("id").alias("s"))
    )
    # distinct canonical plans (different filters) -> distinct builders,
    # but both cached plans contain g's identical groupBy exchange
    a = g.filter("s > 10").cache()
    b = g.filter("s < 10").cache()
    try:
        a.count()
        b.count()
        j = a.selectExpr("k", "s as sa").join(
            b.selectExpr("k as k2", "s as sb"), F.col("k") == F.col("k2")
        )
        assert count_exchanges(j) == 2
    finally:
        a.unpersist()
        b.unpersist()
