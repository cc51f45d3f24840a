"""Runtime bloom-filter join pruning: on a cluster-sized scan, Spark
injects a bloom filter built from the selective (filtered) side of a
shuffle join into the probe side's scan stage, so fact rows that cannot
match die before the exchange.  The trigger thresholds are sized for
real clusters (probe scan >= 10 GiB by default) — far above the local
test parquet — so this test lowers them to prove the rewrite fires for
our join shapes; at 100 TB the defaults fire on their own.
"""

from __future__ import annotations

import pytest


@pytest.fixture()
def bloom_spark(spark):
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_thr = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    # force a shuffle join (no broadcast) and let the bloom rewrite see
    # the small probe scan as "big enough"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0",
    )
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        old_thr,
    )


def test_bloom_filter_injected_on_selective_shuffle_join(bloom_spark, sf_dir):
    spark = bloom_spark
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        "o_orderpriority = '1-URGENT'"
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    plan = j._jdf.queryExecution().optimizedPlan().toString()
    assert "might_contain" in plan, "bloom runtime filter not injected"
    assert "bloom_filter_agg" in plan
    # and the rewritten plan still returns the right rows
    expected = (
        li.join(o.hint("broadcast"), li.l_orderkey == o.o_orderkey).count()
    )
    assert j.count() == expected


def test_bloom_filter_absent_without_selective_filter(bloom_spark, sf_dir):
    """No creation-side filter -> nothing selective to exploit -> the
    optimizer must NOT pay for a useless bloom build."""
    spark = bloom_spark
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    plan = j._jdf.queryExecution().optimizedPlan().toString()
    assert "might_contain" not in plan
