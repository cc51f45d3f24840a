#!/usr/bin/env python
"""Time a named subset of registry queries at a given SF dir — the
A/B instrument for targeted perf work (quiet-gate the host first with
``bench._calibrate_cpu``; see memory/host-noise protocol).

    python tools/time_queries.py q1 q2 ... [--sf /root/testdata/sf0.1]
                                 [--reps 3]

Prints per-query wall seconds (min over reps, after one warm-up) as one
JSON line.  Uses the same session shape as bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from bench import _calibrate_cpu  # noqa: E402
    from atd_data_lake_spark.queries import QUERIES  # noqa: E402
    from atd_data_lake_spark.session import get_spark  # noqa: E402

    calib = _calibrate_cpu()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="time_queries",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    # warm JVM / python-worker pool (same as bench.py)
    spark.read.parquet(f"{args.sf}/nation.parquet").count()
    spark.range(1000, numPartitions=8).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    out: dict[str, float] = {}
    for name in args.names:
        fn = QUERIES[name]
        times = []
        for rep in range(args.reps + 1):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            fn(spark, args.sf).collect()
            dt = time.monotonic() - t0
            if rep:  # rep 0 is warm-up
                times.append(round(dt, 3))
        out[name] = min(times)
        print(f"  {name}: min={min(times)} all={times}", file=sys.stderr)
    print(json.dumps({"calib": calib, "sf": args.sf, "queries": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
