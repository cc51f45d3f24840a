"""Round-22 query addition: bounded k-hop reachability (BFS).

``graph_k_hop`` — per-seed BFS frontier expansion over the co-purchase
graph: how many distinct parts are reachable within 1, 2, and 3 hops of
each seed part (parts ≡ 0 mod 1000).  The iterative-join family member
beside PageRank (fixed-mass power iteration) and connected components
(label propagation): each hop is ONE distinct equi-join of the
(seed, node) frontier against the edge list — frontier rows are pairs,
never neighborhood lists, so no row grows with degree; the 3-round
unroll keeps lineage bounded without checkpoints.  DuckDB oracle =
three unrolled CTE joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SEED_MOD = 1000
_HOPS = 3


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from atd_data_lake_spark.io.reader import read_table

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return read_table(spark, sf_dir, name)


def graph_k_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(seed, n_1hop, n_2hop, n_3hop) — cumulative distinct reachable
    node counts, seed excluded."""
    from atd_data_lake_spark.round13_queries import _copurchase_pairs

    pairs = _copurchase_pairs(spark, sf_dir)
    edges = pairs.select(F.col("a").alias("s"), F.col("b").alias("d")).unionAll(
        pairs.select(F.col("b").alias("s"), F.col("a").alias("d"))
    ).persist()

    seeds = (
        edges.select(F.col("s").alias("seed"))
        .filter(F.col("seed") % _SEED_MOD == 0)
        .distinct()
    )
    # delta-BFS extracted to operators/graph.k_hop_counts (r7) so the
    # 10× scale smoke runs the identical code path; semantics and output
    # unchanged (every seed comes from the edge list, so it has ≥1 hop-1
    # neighbor and survives the groupBy; seed self-rows sit at hop 0)
    from atd_data_lake_spark.operators.graph import k_hop_counts

    return k_hop_counts(edges, seeds, hops=_HOPS)


GRAPH_K_HOP_SQL = f"""
WITH b AS (
    SELECT l_orderkey,
           list_sort(list_distinct(list(l_partkey))) AS parts
    FROM lineitem GROUP BY l_orderkey
),
pairs AS (
    SELECT DISTINCT t1.a, t2.b
    FROM b, UNNEST(b.parts) t1(a), UNNEST(b.parts) t2(b)
    WHERE t1.a < t2.b
),
edges AS (
    SELECT a AS s, b AS d FROM pairs UNION ALL SELECT b, a FROM pairs
),
seeds AS (
    SELECT DISTINCT s AS seed FROM edges WHERE s % {_SEED_MOD} = 0
),
h1 AS (
    SELECT DISTINCT sd.seed, e.d AS node
    FROM seeds sd JOIN edges e ON e.s = sd.seed
),
r1 AS (
    SELECT seed, node FROM h1
    UNION SELECT seed, seed FROM seeds
),
h2 AS (
    SELECT DISTINCT r.seed, e.d AS node
    FROM h1 r JOIN edges e ON e.s = r.node
),
r2 AS (SELECT seed, node FROM r1 UNION SELECT seed, node FROM h2),
h3 AS (
    SELECT DISTINCT r.seed, e.d AS node
    FROM h2 r JOIN edges e ON e.s = r.node
),
r3 AS (SELECT seed, node FROM r2 UNION SELECT seed, node FROM h3)
SELECT s.seed,
       (SELECT count(*) FROM r1 WHERE r1.seed = s.seed AND r1.node != s.seed)
         AS n_1hop,
       (SELECT count(*) FROM r2 WHERE r2.seed = s.seed AND r2.node != s.seed)
         AS n_2hop,
       (SELECT count(*) FROM r3 WHERE r3.seed = s.seed AND r3.node != s.seed)
         AS n_3hop
FROM seeds s
ORDER BY s.seed
"""


ROUND22_QUERIES = {"graph_k_hop": graph_k_hop}
ROUND22_ORACLES = {"graph_k_hop": GRAPH_K_HOP_SQL}
