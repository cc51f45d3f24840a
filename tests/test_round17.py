"""Round-17 targeted tests: the Misra-Gries prefilter's guarantee (the
oracle proves exactness at the default partitioning; these prove it
holds under adversarial partitioning and that the summary state stays
bounded)."""

from __future__ import annotations

import pandas as pd

from atd_data_lake_spark.round17_queries import (
    _MG_COUNTERS,
    _mg_partition,
)


def test_mg_summary_bounded_and_undercounts():
    # 5000 distinct tokens + one hot token, streamed in 10 batches
    hot = ["hot"] * 2000
    cold = [f"t{i}" for i in range(5000)]
    toks = []
    for i in range(10):
        toks.extend(hot[i * 200 : (i + 1) * 200])
        toks.extend(cold[i * 500 : (i + 1) * 500])
    batches = [
        pd.DataFrame({"token": toks[j : j + 700]}) for j in range(0, len(toks), 700)
    ]
    out = list(_mg_partition(iter(batches)))[0]
    assert len(out) <= _MG_COUNTERS
    n = int(out["n_seen"].iloc[0])
    assert n == len(toks)
    row = out[out["token"] == "hot"]
    assert len(row) == 1
    mg = int(row["mg_count"].iloc[0])
    # undercount, but by at most n/(k'+1)
    assert mg <= 2000
    assert 2000 - mg <= n // (_MG_COUNTERS + 1) + 1


def test_heavy_hitters_partition_invariant(spark, sf_dir):
    from atd_data_lake_spark.io.reader import read_table
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from atd_data_lake_spark.round17_queries import (
        _HH_DIVISOR,
        _mg_partition,
    )

    d = read_table(spark, sf_dir, "documents")
    toks = (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    schema = T.StructType(
        [
            T.StructField("token", T.StringType()),
            T.StructField("mg_count", T.LongType()),
            T.StructField("n_seen", T.LongType()),
        ]
    )

    def run(parts):
        t = toks.repartition(parts)
        n_total = t.count()
        thr, slack = n_total // _HH_DIVISOR, n_total // 1024
        cands = (
            t.mapInPandas(_mg_partition, schema=schema)
            .groupBy("token")
            .agg(F.sum("mg_count").alias("s"))
            .filter(F.col("s") >= max(thr - slack, 1))
            .select("token")
        )
        return sorted(
            map(
                tuple,
                t.join(F.broadcast(cands), "token")
                .groupBy("token")
                .agg(F.count("*").alias("n"))
                .filter(F.col("n") >= thr)
                .collect(),
            )
        )

    assert run(2) == run(31) != []
