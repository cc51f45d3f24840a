#!/usr/bin/env python
"""Full-registry verify sweep: every __spark_entry__.queries() entry vs
its oracle_sql() on DuckDB in a PLAIN SparkSession (driver simulation).

    python tools/full_sweep.py [sf_dir] [--skip-entry] [--only n1,n2,...]

Prints one line per query and a final "FAILS: n" verdict line.
Null-safe sort key per tests/test_oracle_parity.py::_rows.
"""

from __future__ import annotations

import datetime
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


def _rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    normed = (tuple(_norm(r[i]) for i in order) for r in rows)
    return sorted(
        normed,
        key=lambda t: tuple((x is not None, str(type(x)), x) for x in t),
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import duckdb
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as m

    if "--skip-entry" not in sys.argv:
        print("entry rows:", len(m.entry(spark).collect()), flush=True)
    qs, os_ = m.queries(), m.oracle_sql()
    for a in sys.argv[1:]:
        if a.startswith("--only"):
            names = (a.split("=", 1)[1] if "=" in a
                     else sys.argv[sys.argv.index(a) + 1]).split(",")
            qs = {n: qs[n] for n in names}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    fails = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            cols = sorted(sdf.columns)
            s = _rows(sdf.columns, sdf.select(*sdf.columns).collect())
            if name in os_:
                d_cols = ", ".join(cols)
                d = _rows(
                    cols,
                    con.execute(
                        f"SELECT {d_cols} FROM ({os_[name]})"
                    ).fetchall(),
                )
                ok = s == d
                status = "ok" if ok else f"MISMATCH spark={len(s)} duck={len(d)}"
            else:
                ok = True
                status = f"rows-only ({len(s)} rows)"
            if not ok:
                fails.append(name)
        except Exception as e:  # noqa: BLE001
            fails.append(name)
            status = f"ERROR {type(e).__name__}: {str(e)[:120]}"
        spark.catalog.clearCache()
        print(f"{name}: {status} [{time.time() - t0:.1f}s]", flush=True)
    print("FAILS:", len(fails), fails, flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
