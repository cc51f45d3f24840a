"""SQL-text interface: the engine's tables register as views and
standard ANSI SQL text runs unchanged through spark.sql, matching the
DataFrame-built plans row-for-row.  This is the surface a reference
user's downstream analysts actually type."""

from __future__ import annotations

import pytest

from atd_data_lake_spark.io.reader import read_table
from atd_data_lake_spark.queries import QUERIES

TABLES = ["customer", "orders", "lineitem", "nation", "supplier", "part", "events"]

# (registry query, equivalent ANSI SQL text runnable by BOTH Spark and DuckDB)
SQL_TEXT = {
    "q6_forecast_revenue": """
        SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                            * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE), 2) AS revenue,
               count(*) AS n_lineitems
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.03 AND 0.05
          AND l_quantity < 24
    """,
    "q19_disjunctive_pricing": """
        SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                     * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
                     AS DOUBLE), 2) AS revenue,
               count(*) AS n_lineitems
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size <= 10 AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#2' AND p_size <= 20 AND l_quantity BETWEEN 10 AND 30)
    """,
    "q13_order_count_distribution": """
        WITH per_cust AS (
          SELECT o_custkey AS c_custkey, count(*) AS c_count
          FROM orders GROUP BY o_custkey
        )
        SELECT coalesce(c_count, 0) AS c_count, count(*) AS custdist
        FROM customer LEFT JOIN per_cust USING (c_custkey)
        GROUP BY coalesce(c_count, 0)
        ORDER BY custdist DESC, c_count DESC
    """,
    "evt_top_paths": """
        WITH seq AS (
            SELECT event_type AS step1,
                   lead(event_type, 1) OVER w AS step2,
                   lead(event_type, 2) OVER w AS step3
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT step1, step2, step3, count(*) AS n_paths
        FROM seq WHERE step2 IS NOT NULL AND step3 IS NOT NULL
        GROUP BY 1, 2, 3
        ORDER BY n_paths DESC, step1, step2, step3
        LIMIT 25
    """,
    "dq_snapshot_diff": """
        WITH t0 AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM orders WHERE o_orderkey % 11 != 0
        ),
        t1 AS (
            SELECT o_orderkey, o_orderstatus,
                   CASE WHEN o_orderkey % 7 = 0 THEN round(o_totalprice + 10.0, 2)
                        ELSE o_totalprice END AS o_totalprice
            FROM orders WHERE o_orderkey % 13 != 0
        ),
        j AS (
            SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
                   CASE WHEN a.o_orderkey IS NULL THEN 'added'
                        WHEN b.o_orderkey IS NULL THEN 'removed'
                        WHEN a.o_totalprice != b.o_totalprice
                             OR a.o_orderstatus != b.o_orderstatus THEN 'changed'
                        ELSE 'unchanged' END AS change_type,
                   round(a.o_totalprice, 2) AS old_totalprice,
                   round(b.o_totalprice, 2) AS new_totalprice
            FROM t0 a FULL OUTER JOIN t1 b ON a.o_orderkey = b.o_orderkey
        )
        SELECT * FROM j WHERE change_type != 'unchanged' ORDER BY o_orderkey
    """,
    "olap_pareto_8020": """
        WITH per_cust AS (
            SELECT o.o_custkey,
                   CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                            * (CAST(1 AS DECIMAL(3,2))
                               - CAST(l.l_discount AS DECIMAL(3,2))))
                        AS DECIMAL(38,4)) AS rev
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_custkey
        ),
        ranked AS (
            SELECT n.n_name, p.rev,
                   row_number() OVER (PARTITION BY n.n_name
                                      ORDER BY p.rev DESC, p.o_custkey) AS i,
                   sum(p.rev) OVER (PARTITION BY n.n_name
                                    ORDER BY p.rev DESC, p.o_custkey
                                    ROWS UNBOUNDED PRECEDING) AS cum,
                   sum(p.rev) OVER (PARTITION BY n.n_name) AS total
            FROM per_cust p
            JOIN customer c ON c.c_custkey = p.o_custkey
            JOIN nation n ON n.n_nationkey = c.c_nationkey
        ),
        agg AS (
            SELECT n_name, count(*) AS n_customers,
                   min(CASE WHEN cum * 10 >= total * 8 THEN i END)
                     AS top_for_80pct
            FROM ranked GROUP BY n_name
        )
        SELECT n_name, n_customers, top_for_80pct,
               round(top_for_80pct / CAST(n_customers AS DOUBLE), 6)
                 AS share_of_customers
        FROM agg
        ORDER BY n_name
    """,
    "evt_user_entropy": """
        WITH counts AS (
            SELECT user_id, event_type, count(*) AS c
            FROM events GROUP BY user_id, event_type
        ),
        agg AS (
            SELECT user_id, sum(c) AS t, count(*) AS n_types,
                   sum(CAST(round(c * ln(c), 9) AS DECIMAL(28,9))) AS _clnc
            FROM counts GROUP BY user_id
        )
        SELECT user_id, t AS n_events, n_types,
               round(ln(CAST(t AS DOUBLE)) - CAST(_clnc AS DOUBLE) / t, 6)
                 AS entropy_nats
        FROM agg
        ORDER BY user_id
    """,
    "dq_uniqueness": """
        WITH one AS (
            SELECT count(*) AS n_rows,
                   sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS nn_k,
                   count(DISTINCT o_orderkey) AS nd_k,
                   sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS nn_c,
                   count(DISTINCT o_custkey) AS nd_c,
                   sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS nn_s,
                   count(DISTINCT o_orderstatus) AS nd_s,
                   sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS nn_t,
                   count(DISTINCT o_totalprice) AS nd_t,
                   sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS nn_d,
                   count(DISTINCT o_orderdate) AS nd_d,
                   sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS nn_p,
                   count(DISTINCT o_orderpriority) AS nd_p
            FROM orders
        )
        SELECT 'o_orderkey' AS column_name, n_rows, nn_k AS n_nulls, nd_k AS n_distinct,
               nd_k = n_rows - nn_k AS all_unique,
               nn_k = 0 AND nd_k = n_rows AS is_candidate_key FROM one
        UNION ALL SELECT 'o_custkey', n_rows, nn_c, nd_c,
               nd_c = n_rows - nn_c, nn_c = 0 AND nd_c = n_rows FROM one
        UNION ALL SELECT 'o_orderstatus', n_rows, nn_s, nd_s,
               nd_s = n_rows - nn_s, nn_s = 0 AND nd_s = n_rows FROM one
        UNION ALL SELECT 'o_totalprice', n_rows, nn_t, nd_t,
               nd_t = n_rows - nn_t, nn_t = 0 AND nd_t = n_rows FROM one
        UNION ALL SELECT 'o_orderdate', n_rows, nn_d, nd_d,
               nd_d = n_rows - nn_d, nn_d = 0 AND nd_d = n_rows FROM one
        UNION ALL SELECT 'o_orderpriority', n_rows, nn_p, nd_p,
               nd_p = n_rows - nn_p, nn_p = 0 AND nd_p = n_rows FROM one
        ORDER BY column_name
    """,
}


def _register(spark, sf_dir):
    for t in TABLES:
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(x) for x in r) for r in df.select(*cols).collect())


@pytest.mark.parametrize("name", sorted(SQL_TEXT))
def test_sql_text_matches_dataframe_plan(spark, sf_dir, name):
    _register(spark, sf_dir)
    via_sql = _rows(spark.sql(SQL_TEXT[name]))
    via_df = _rows(QUERIES[name](spark, sf_dir))
    assert via_sql == via_df
