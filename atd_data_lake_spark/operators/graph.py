"""Integer-exact PageRank message passing over a node-sized adjacency.

Extracted from the ``graph_pagerank`` registry query (round7_queries)
so the hub-salting variant is a first-class, tested code path rather
than a docstring recipe.

Rank is bigint "mass" (``total_mass`` units split across nodes) and
every transfer is an integer division with positive operands, so the
result is bit-identical regardless of partitioning, accumulation
order, salting, or engine — the discipline that gives an iterative
algorithm a full value-hash DuckDB oracle.

Scale shape (100 TB argument): the graph materializes once as a
node-sized adjacency ``(src, deg, dsts array)`` — one groupBy shuffle
builds degree and neighbor list together.  On a hub-heavy graph a
single node's ``collect_list`` row would hold its full neighbor set;
``salt_buckets=k`` splits each node's list across ``k`` fixed buckets
``(src, pmod(hash(dst), k))`` so no single adjacency row exceeds
``max_degree / k`` entries, while total degree is re-aggregated from
the bucket counts (k rows per node — a second, bucket-reduced
shuffle).  Each iteration then joins the bucketed adjacency with the
broadcast node-sized rank frame exactly as the unsalted path does;
the per-edge contribution ``(85·mass) div (100·deg)`` uses the TOTAL
degree, so masses are identical bit-for-bit (asserted in
tests/test_graph_salted.py on a 30%-hub graph).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_masses(
    edges: DataFrame,
    n_iter: int = 5,
    total_mass: int = 1_000_000_000_000,
    salt_buckets: int | None = None,
    dedupe_edges: bool = False,
) -> DataFrame:
    """(node, mass) after ``n_iter`` integer-exact PageRank rounds.

    ``edges`` is a directed edge list ``(src, dst)``; orient an
    undirected graph both ways before calling.  Every node keeps the
    teleport share ``15·total_mass div (100·N)`` and receives
    ``(85·mass) div (100·deg)`` from each in-neighbor per round.

    ``salt_buckets=None`` builds one adjacency row per node;
    ``salt_buckets=k`` splits each node's neighbor list across ``k``
    hash buckets (hub-degree bound) with bit-identical output.

    ``dedupe_edges=True`` accepts a NON-distinct edge stream and
    dedupes it inside the adjacency aggregation (``collect_set`` /
    ``n_distinct``) — the map-side partial agg dedupes before the
    shuffle, so callers can skip their own ``.distinct()`` exchange
    over the full edge stream (one exchange saved on the cold path;
    output bit-identical since deg and the neighbor set are the same).

    NOTE: nodes with out-degree but no in-edges still appear (every
    node of this symmetric-orientation graph has both); sink handling
    follows the registry query's convention (mass re-derived from
    in-contributions each round).
    """
    if dedupe_edges:
        # collect_set dedupes in the PARTIAL (map-side) aggregation, so
        # duplicate edges never reach the shuffle; size(dsts) is the
        # distinct degree
        neigh_agg = F.collect_set("dst").alias("dsts")
    else:
        neigh_agg = F.collect_list("dst").alias("dsts")

    if salt_buckets is None:
        adj = (
            edges.groupBy("src")
            .agg(neigh_agg)
            .select("src", F.size("dsts").cast("long").alias("deg"), "dsts")
            .persist()
        )
        nodes = adj.select("src")  # unique by construction: groupBy key
    else:
        bucket_adj = (
            edges.groupBy(
                "src",
                F.pmod(F.xxhash64("dst"), F.lit(salt_buckets)).alias("_bkt"),
            )
            .agg(neigh_agg)
            .select(
                "src", F.size("dsts").cast("long").alias("_deg_b"), "dsts"
            )
            .persist()
        )
        # total degree from the bucket-reduced rows (≤ k per node), then
        # re-attached so each bucket row carries the node's TOTAL degree
        deg = bucket_adj.groupBy("src").agg(F.sum("_deg_b").alias("deg"))
        adj = (
            bucket_adj.join(F.broadcast(deg), "src")
            .select("src", "deg", "dsts")
            .persist()
        )
        nodes = deg.select("src")  # unique: deg is grouped by src

    n_nodes = nodes.agg(F.count("*").alias("n")).select(
        "n", F.lit(15 * total_mass).alias("_tele_num")
    )
    base = n_nodes.select(
        F.expr(f"{total_mass} div n").alias("_m0"),
        F.expr("_tele_num div (100 * n)").alias("_base"),
    )
    ranks = nodes.crossJoin(F.broadcast(base)).select(
        F.col("src").alias("node"),
        F.col("_m0").alias("mass"),
        F.col("_base"),
    )
    for _ in range(n_iter):
        # the rank frame is node-sized: broadcast it so each round is a
        # map-side join + explode + one map-side-combined agg exchange.
        # When the node set outgrows the broadcast threshold, drop the
        # hint — integer masses stay exact under a shuffle join too.
        contrib = (
            adj.join(F.broadcast(ranks), adj["src"] == ranks["node"])
            .select(
                F.explode("dsts").alias("dst"),
                F.expr("(85 * mass) div (100 * deg)").alias("c"),
                F.col("_base"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("_in"), F.first("_base").alias("_base"))
        )
        ranks = contrib.select(
            F.col("dst").alias("node"),
            (F.col("_base") + F.col("_in")).alias("mass"),
            F.col("_base"),
        )
    return ranks.select("node", "mass")
