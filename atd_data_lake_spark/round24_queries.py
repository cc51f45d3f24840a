"""Round-24 query additions: triangle census and BM25 retrieval.

``graph_triangles`` — per-node triangle count and local clustering
coefficient over the co-purchase graph: the per-node drill-down of
round 13's one-row global census (``graph_triangle_count``), which
reports corpus-level totals but cannot say WHICH nodes sit in dense
neighborhoods.  The classic skew trap in
distributed triangle counting is wedge enumeration at hub nodes
(wedges ∝ degree²); the standard fix (Suri & Vassilvitskii's MR
node-iterator++) is to orient every edge from its lower-(degree, id)
endpoint to its higher one, which caps every node's out-degree at
O(sqrt(|E|)) and makes the wedge count sum(outdeg²) instead of
sum(deg²).  Each triangle is enumerated exactly once under ANY
orientation, so the DuckDB oracle can use plain id-ordering while the
Spark plan degree-orients — identical output, skew-safe plan.

``text_bm25_topk`` — Okapi BM25 (k1=1.2, b=0.75) retrieval of the
top-10 documents for a fixed conjunctive keyword query.  The ranked
sibling of ``text_tfidf_top_terms``: idf and the length-normalized tf
saturation are floats, so the per-term contributions are rounded to
9 dp and summed as DECIMAL(38,9) (order-invariant — the token-entropy
parity pattern), and the global top-k is orderBy+limit (Spark's
distributed TakeOrdered), never a partition-less window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TERMS = ("spark", "merge", "window")
_BM25_TOPK = 10


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from atd_data_lake_spark.io.reader import read_table

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return read_table(spark, sf_dir, name)


def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(node, degree, triangles, clustering) for every node with
    degree >= 2, ordered by node.

    Shuffle shape: degree agg (1 shuffle on node), rank join onto the
    edge list (node-keyed), one self-join on the wedge apex, one
    equi-join to close the wedge, explode-3 + count.  Every join is a
    key equi-join on node ids — no row ever carries a neighbor list,
    so nothing grows with degree; the (deg, id) orientation bounds the
    apex fan-out at hubs.
    """
    from atd_data_lake_spark.round13_queries import _copurchase_pairs

    pairs = _copurchase_pairs(spark, sf_dir)  # (a, b), a < b, distinct

    deg = (
        pairs.select(F.col("a").alias("node"))
        .unionAll(pairs.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )

    # orient each edge from lower (degree, id) to higher: src -> dst,
    # carrying the dst rank for the wedge ordering below
    e = (
        pairs.join(deg.select(F.col("node").alias("a"), F.col("degree").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("degree").alias("db")), "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(
                    F.col("a").alias("src"),
                    F.col("b").alias("dst"),
                    F.struct(F.col("db").alias("d"), F.col("b").alias("n")).alias("rdst"),
                ),
            )
            .otherwise(
                F.struct(
                    F.col("b").alias("src"),
                    F.col("a").alias("dst"),
                    F.struct(F.col("da").alias("d"), F.col("a").alias("n")).alias("rdst"),
                )
            )
            .alias("o")
        )
        .select("o.src", "o.dst", "o.rdst")
        # no persist: the three consumers re-derive the frame through
        # AQE-reused shuffles (free disk reuse) instead of pinning an
        # edge-sized deserialized block in executor memory — the
        # difference between finishing and GC-thrashing in a small heap
    )

    # wedges at apex u: out-neighbors v < w in rank order; close with
    # the oriented edge (v, w).  Both joins carry EDGE-sized (and at the
    # apex, wedge-sized) streams, so they are hinted to sort-merge:
    # Catalyst's size estimate through the basket posexplode is garbage
    # (it priced the oriented edge frame under the broadcast threshold
    # and planned THREE edge-sized broadcast builds — which OOMs a
    # default 1 GB driver at sf0.1 and would be catastrophic at scale;
    # SMJ spills gracefully at any size)
    e1 = e.select(F.col("src").alias("u"), F.col("dst").alias("v"), F.col("rdst").alias("rv"))
    e2 = e.select(F.col("src").alias("u"), F.col("dst").alias("w"), F.col("rdst").alias("rw"))
    wedges = (
        e1.join(e2.hint("merge"), "u")
        .filter(F.col("rv") < F.col("rw"))
        .select("u", "v", "w")
    )
    tri = wedges.join(
        e.select(F.col("src").alias("v"), F.col("dst").alias("w")).hint("merge"),
        ["v", "w"],
    ).select("u", "v", "w")

    tcnt = (
        tri.select(F.col("u").alias("node"))
        .unionAll(tri.select(F.col("v").alias("node")))
        .unionAll(tri.select(F.col("w").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("triangles"))
    )

    return (
        deg.filter(F.col("degree") >= 2)
        .join(tcnt, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce("triangles", F.lit(0)).alias("triangles"),
            F.round(
                F.lit(2.0)
                * F.coalesce("triangles", F.lit(0))
                / (F.col("degree") * (F.col("degree") - F.lit(1))),
                6,
            ).alias("clustering"),
        )
        .orderBy("node")
    )


GRAPH_TRIANGLES_SQL = """
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
deg AS (
    SELECT node, count(*) AS degree
    FROM (SELECT a AS node FROM pairs UNION ALL SELECT b FROM pairs)
    GROUP BY node
),
tri AS (
    -- id-orientation enumerates the same triangle set as the engine's
    -- degree-orientation: each (u < v < w) exactly once
    SELECT e1.a AS u, e1.b AS v, e2.b AS w
    FROM pairs e1
    JOIN pairs e2 ON e2.a = e1.b
    JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b
),
tcnt AS (
    SELECT node, count(*) AS triangles
    FROM (SELECT u AS node FROM tri
          UNION ALL SELECT v FROM tri
          UNION ALL SELECT w FROM tri)
    GROUP BY node
)
SELECT d.node, d.degree,
       COALESCE(t.triangles, 0) AS triangles,
       round(2.0 * COALESCE(t.triangles, 0)
             / (d.degree * (d.degree - 1)), 6) AS clustering
FROM deg d LEFT JOIN tcnt t USING (node)
WHERE d.degree >= 2
ORDER BY d.node
"""


def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(rank, doc_id, n_terms_hit, score) — top-10 documents by BM25
    for the fixed query terms, score summed exact-decimal.

    Plan: tokenize/explode (no Python), per-doc length agg, tf for the
    3 query terms only (filter BEFORE the tf shuffle — the term filter
    prunes the token stream to the query's posting lists), df + corpus
    stats as 1-row/3-row broadcasts, one keyed agg for the score, then
    orderBy+limit — Spark plans a distributed TakeOrdered, so no
    single-partition window ever sees the full corpus.
    """
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = d.select(
        "doc_id",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("term"),
    )
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum("dl") / F.count("*")).alias("avgdl"),
    )

    qtoks = toks.filter(F.col("term").isin(*_BM25_TERMS))
    tf = qtoks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))

    contrib = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(stats))  # 1-row broadcast: benign nested-loop
        .join(dl, "doc_id")
        .select(
            "doc_id",
            "term",
            F.round(
                F.log(
                    (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                    + F.lit(1.0)
                )
                * (F.col("tf") * (_BM25_K1 + 1))
                / (
                    F.col("tf")
                    + _BM25_K1
                    * (
                        F.lit(1.0)
                        - F.lit(_BM25_B)
                        + F.lit(_BM25_B) * F.col("dl") / F.col("avgdl")
                    )
                ),
                9,
            )
            .cast("decimal(38,9)")
            .alias("c"),
        )
    )
    scored = contrib.groupBy("doc_id").agg(
        F.count("*").alias("n_terms_hit"),
        F.round(F.sum("c"), 6).cast("double").alias("score"),
    )
    top = scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(
        _BM25_TOPK
    )
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return top.select(
        F.row_number().over(w).alias("rank"), "doc_id", "n_terms_hit", "score"
    )


def _bm25_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    k1, b, k = _BM25_K1, _BM25_B, _BM25_TOPK
    return f"""
WITH toks AS (
    SELECT doc_id, t.term
    FROM documents,
         UNNEST(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t(term)
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (
    SELECT CAST(count(*) AS DOUBLE) AS n_docs,
           sum(dl) / count(*) AS avgdl
    FROM dl
),
tf AS (
    SELECT doc_id, term, count(*) AS tf
    FROM toks WHERE term IN ({terms})
    GROUP BY doc_id, term
),
dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
contrib AS (
    SELECT tf.doc_id,
           CAST(round(
               ln((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
               * (tf.tf * ({k1} + 1))
               / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / stats.avgdl)),
               9) AS DECIMAL(38,9)) AS c
    FROM tf
    JOIN dfreq USING (term)
    CROSS JOIN stats
    JOIN dl USING (doc_id)
),
scored AS (
    SELECT doc_id, count(*) AS n_terms_hit,
           CAST(round(sum(c), 6) AS DOUBLE) AS score
    FROM contrib GROUP BY doc_id
),
top AS (
    SELECT * FROM scored ORDER BY score DESC, doc_id ASC LIMIT {k}
)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT)
           AS rank,
       doc_id, n_terms_hit, score
FROM top
ORDER BY rank
"""


ROUND24_QUERIES = {
    "graph_triangles": graph_triangles,
    "text_bm25_topk": text_bm25_topk,
}
ROUND24_ORACLES = {
    "graph_triangles": GRAPH_TRIANGLES_SQL,
    "text_bm25_topk": _bm25_sql(),
}
