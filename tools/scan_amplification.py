#!/usr/bin/env python
"""Measure ACTUAL physical scan amplification for scan-heavy registry
queries (VERDICT r5 item 5).

PLANS.md's per-occurrence listings count how many times a table's scan
APPEARS in the plan tree (graph_triangle_count: lineitem ×47,
dedup_incremental_minhash: documents ×81) — but AQE exchange reuse and
cached subtrees mean most occurrences never execute.  This tool answers
the question that matters at 100 TB: how many rows did each table's
scans actually PRODUCE, relative to the table's size?

Method: run the query to completion, then walk the FINALIZED executed
plan (descending through AQE wrappers, query stages, reused exchanges,
cached plans and subqueries), dedupe scan operators by JVM node identity
(a reused stage shows the same node instance several times — its
runtime metric must count once), and read each scan's ``numOutputRows``
SQLMetric.  amplification = sum(scan output rows) / table row count.

Usage::

    python tools/scan_amplification.py [query ...]   # default: the two
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/scan_amplification.py
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = ["graph_triangle_count", "dedup_incremental_minhash"]
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _walk(root, jvm=None):
    """Yield every distinct physical node reachable from ``root``,
    including AQE-finalized subtrees, reused/cached plans, subqueries.

    Dedupe is by JVM OBJECT IDENTITY (``System.identityHashCode``), not
    ``SparkPlan.id()`` — plan ids restart per compiled query, so nodes
    inside a cached plan collide with main-plan ids and a shared seen-set
    keyed on id() silently skips whole cached subtrees (observed:
    graph_triangle_count's parquet scans all live under its two caches).
    Identity is also the correct metric key: one cached plan referenced
    by N InMemoryTableScans materialized once, so its scan's
    numOutputRows must count once."""
    seen = set()
    stack = [root]
    while stack:
        n = stack.pop()
        try:
            nid = jvm.java.lang.System.identityHashCode(n) if jvm else n.id()
        except Exception:
            nid = id(n)
        if nid in seen:
            continue
        seen.add(nid)
        yield n
        cls = n.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            try:
                stack.append(n.executedPlan())
            except Exception:
                pass
        elif cls.endswith("QueryStageExec"):
            try:
                stack.append(n.plan())
            except Exception:
                pass
        elif cls == "ReusedExchangeExec":
            try:
                stack.append(n.child())
            except Exception:
                pass
        elif cls == "InMemoryTableScanExec":
            try:
                stack.append(n.relation().cachedPlan())
            except Exception:
                pass
        for getter in ("children", "subqueries"):
            try:
                ch = getattr(n, getter)()
                for i in range(ch.size()):
                    stack.append(ch.apply(i))
            except Exception:
                pass


def scan_rows_by_table(df) -> dict[str, tuple[int, int]]:
    """{table: (n_scan_nodes, total numOutputRows across them)} for the
    df's FINALIZED executed plan (call AFTER materializing the df)."""
    out: dict[str, tuple[int, int]] = {}
    jvm = df.sparkSession._jvm
    for n in _walk(df._jdf.queryExecution().executedPlan(), jvm):
        cls = n.getClass().getSimpleName()
        if "FileSourceScan" not in cls and "BatchScan" not in cls:
            continue
        desc = n.simpleString(200)
        m = re.search(r"(\w+)\.parquet", desc)
        table = m.group(1) if m else "?"
        try:
            rows = int(n.metrics().apply("numOutputRows").value())
        except Exception:
            rows = -1
        cnt, tot = out.get(table, (0, 0))
        out[table] = (cnt + 1, tot + max(rows, 0))
    return out


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or DEFAULT_QUERIES

    from atd_data_lake_spark.queries import QUERIES
    from atd_data_lake_spark.session import get_spark

    spark = get_spark(app_name="scan_amplification", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    table_rows = {}
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            table_rows[t] = spark.read.parquet(p).count()

    for name in names:
        spark.catalog.clearCache()
        t0 = time.time()
        df = QUERIES[name](spark, sf_dir)
        n = len(df.collect())
        wall = time.time() - t0
        print(f"\n== {name} @ {sf_dir}: {n} rows, {wall:.1f}s")
        for table, (cnt, rows) in sorted(scan_rows_by_table(df).items()):
            base = table_rows.get(table, 0)
            amp = rows / base if base else float("nan")
            print(
                f"   {table:<12} executed_scan_nodes={cnt:>3} "
                f"scan_rows={rows:>12,} table_rows={base:>10,} "
                f"amplification={amp:6.1f}x"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
