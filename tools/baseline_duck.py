#!/usr/bin/env python
"""Time every oracle-backed headline query in DuckDB over the same
parquet (the judge's proxy-baseline methodology) and print the Spark/
DuckDB ratio per query using the latest bench timings.

Usage: python tools/baseline_duck.py BENCH.json [sf_dir]
BENCH.json = output of bench.py (the {"metric": ...} JSON line).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    bench_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_latest.json"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    bench = json.load(open(bench_path))
    spark_times = bench["queries"]

    import duckdb

    from atd_data_lake_spark.queries import ORACLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    rows = []
    for name, sp in spark_times.items():
        sql = ORACLES.get(name)
        if sql is None:
            continue
        runs = []
        try:
            for _ in range(3):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                runs.append(time.perf_counter() - t0)
            duck = min(runs)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: DUCKDB ERR {str(e).splitlines()[0][:120]}")
            continue
        rows.append((name, sp, duck, sp / duck if duck > 0 else float("inf")))

    rows.sort(key=lambda r: -r[3])
    print(f"{'query':34s} {'spark':>8s} {'duckdb':>8s} {'ratio':>7s}")
    for name, sp, duck, ratio in rows:
        print(f"{name:34s} {sp:8.3f} {duck:8.3f} {ratio:7.2f}")
    tot_s = sum(r[1] for r in rows)
    tot_d = sum(r[2] for r in rows)
    print(
        f"\nTOTAL over {len(rows)} oracle-backed queries: "
        f"spark {tot_s:.1f}s vs duckdb {tot_d:.1f}s -> {tot_s / tot_d:.2f}x"
    )


if __name__ == "__main__":
    main()
