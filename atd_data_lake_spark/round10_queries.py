"""Round-10 query addition: corpus-level Zipf fit.

``text_zipf_fit`` — least-squares slope/intercept of ln(freq) over
ln(rank) for the top-V vocabulary: the corpus-health diagnostic behind
every "is this scrape natural language?" check (natural text ≈ slope −1;
boilerplate/spam corpora bend the curve).  The regression is the
engine's exact-sum discipline (evt_value_correlation): each (x, y) term
is an IEEE-deterministic function of the integer (rank, count) pair,
rounded to 12 dp and DECIMAL-summed, so the fit is bit-identical under
any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from atd_data_lake_spark.io.reader import read_table

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return read_table(spark, sf_dir, name)


_ZIPF_TOP_V = 1000


def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ln-ln regression of token frequency on rank over the top-1000
    vocabulary (whitespace tokens, count-desc + token-asc rank
    tiebreak).

    Plan: one map-side-combined vocab count (the Zipf-bounded aggregate
    every text op reuses), one window rank over the vocab — orders of
    magnitude smaller than the corpus — then a single-row exact-sum
    reduction.  slope/intercept come from the closed-form normal
    equations over DECIMAL-summed rounded terms.
    """
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = d.select(
        F.explode(
            F.when(
                F.trim("text") == "", F.array().cast("array<string>")
            ).otherwise(F.split(F.trim("text"), r"\s+"))
        ).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count("*").alias("freq"))
    # top-V first via TakeOrderedAndProject (distributed, no global sort
    # materializes), THEN the unpartitioned row_number runs over ≤ V rows
    # — a global window over the raw vocabulary would funnel the whole
    # (possibly 10M-type) vocab through one partition at scale
    top = vocab.orderBy(F.desc("freq"), F.asc("tok")).limit(_ZIPF_TOP_V)
    w = Window.orderBy(F.desc("freq"), F.asc("tok"))
    ranked = top.withColumn("rank", F.row_number().over(w))
    x = F.log(F.col("rank").cast("double"))
    y = F.log(F.col("freq").cast("double"))
    dec = lambda c: F.round(c, 12).cast("decimal(38,18)")  # noqa: E731
    sums = ranked.agg(
        F.count("*").alias("n"),
        F.sum(dec(x)).cast("double").alias("sx"),
        F.sum(dec(y)).cast("double").alias("sy"),
        F.sum(dec(x * x)).cast("double").alias("sxx"),
        F.sum(dec(x * y)).cast("double").alias("sxy"),
    )
    n = F.col("n").cast("double")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / n
    return sums.select(
        F.col("n").cast("long").alias("n_types"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round(intercept, 6).alias("zipf_intercept"),
    )


TEXT_ZIPF_FIT_SQL = rf"""
WITH t AS (
    SELECT CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
    FROM documents
),
tok AS (SELECT unnest(toks) AS tok FROM t),
vocab AS (SELECT tok, count(*) AS freq FROM tok GROUP BY 1),
ranked AS (
    SELECT freq,
           row_number() OVER (ORDER BY freq DESC, tok ASC) AS rank
    FROM vocab QUALIFY rank <= {_ZIPF_TOP_V}
),
sums AS (
    SELECT count(*) AS n,
           CAST(sum(CAST(round(ln(rank), 12) AS DECIMAL(38,18))) AS DOUBLE) AS sx,
           CAST(sum(CAST(round(ln(freq), 12) AS DECIMAL(38,18))) AS DOUBLE) AS sy,
           CAST(sum(CAST(round(ln(rank) * ln(rank), 12) AS DECIMAL(38,18))) AS DOUBLE) AS sxx,
           CAST(sum(CAST(round(ln(rank) * ln(freq), 12) AS DECIMAL(38,18))) AS DOUBLE) AS sxy
    FROM ranked
)
SELECT CAST(n AS BIGINT) AS n_types,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
       round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
           AS zipf_intercept
FROM sums
"""


# ---------------------------------------------------------------------------
# emb_drift_shift — embedding-space drift per label between two periods
# ---------------------------------------------------------------------------


def emb_drift_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid shift between two corpus halves (vec_id parity
    as the deterministic period stand-in): cosine of the two centroids
    and the L2 distance between them — the embedding-space counterpart
    of ``dq_psi_drift`` (a model's input drift shows up here before any
    scalar feature moves).

    Float discipline (the emb_label_centroids pattern): per-dimension
    means are exact decimal sums of round-6 elements; the cross-products
    for cosine/L2 are round-12 terms DECIMAL-summed, so the whole
    pipeline is accumulation-order invariant.  Shuffle inventory: one
    (label, period, dim) partial-agg exchange — dimensions aggregate
    independently, which is what makes a billion-vector centroid a plain
    map-side-combined shuffle — then a 2·|labels|·64-row reduction.
    """
    e = _t(spark, sf_dir, "embeddings")
    pos_val = e.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("pos", "val"),
    )
    d6 = "decimal(18,6)"
    means = pos_val.groupBy("label", "half", "pos").agg(
        F.round(
            F.sum(F.round("val", 6).cast(d6)).cast("double") / F.count("*"), 6
        ).alias("m"),
        F.count("*").alias("_n"),
    )
    paired = means.groupBy("label", "pos").agg(
        F.first(F.when(F.col("half") == 0, F.col("m")), ignorenulls=True).alias("m0"),
        F.first(F.when(F.col("half") == 1, F.col("m")), ignorenulls=True).alias("m1"),
        F.first(F.when(F.col("half") == 0, F.col("_n")), ignorenulls=True).alias("n0"),
        F.first(F.when(F.col("half") == 1, F.col("_n")), ignorenulls=True).alias("n1"),
    )
    dec = lambda c: F.round(c, 12).cast("decimal(38,18)")  # noqa: E731
    agg = paired.groupBy("label").agg(
        F.first("n0").alias("n0"),
        F.first("n1").alias("n1"),
        F.sum(dec(F.col("m0") * F.col("m1"))).cast("double").alias("_dot"),
        F.sum(dec(F.col("m0") * F.col("m0"))).cast("double").alias("_s0"),
        F.sum(dec(F.col("m1") * F.col("m1"))).cast("double").alias("_s1"),
        F.sum(dec((F.col("m0") - F.col("m1")) * (F.col("m0") - F.col("m1"))))
        .cast("double")
        .alias("_l2"),
    )
    return agg.select(
        "label",
        F.col("n0").cast("long").alias("n0"),
        F.col("n1").cast("long").alias("n1"),
        F.round(
            F.col("_dot") / (F.sqrt("_s0") * F.sqrt("_s1")), 6
        ).alias("centroid_cos"),
        F.round(F.sqrt("_l2"), 6).alias("l2_shift"),
    ).orderBy("label")


EMB_DRIFT_SHIFT_SQL = """
WITH means AS (
    SELECT label, (vec_id % 2) AS half, i AS pos,
           round(CAST(sum(CAST(round(CAST(embedding[i] AS DOUBLE), 6)
                              AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS m,
           count(*) AS _n
    FROM embeddings, range(1, 65) t(i)
    GROUP BY 1, 2, 3
),
paired AS (
    SELECT label, pos,
           any_value(CASE WHEN half = 0 THEN m END) AS m0,
           any_value(CASE WHEN half = 1 THEN m END) AS m1,
           any_value(CASE WHEN half = 0 THEN _n END) AS n0,
           any_value(CASE WHEN half = 1 THEN _n END) AS n1
    FROM means GROUP BY 1, 2
),
agg AS (
    SELECT label, any_value(n0) AS n0, any_value(n1) AS n1,
           CAST(sum(CAST(round(m0 * m1, 12) AS DECIMAL(38,18))) AS DOUBLE) AS _dot,
           CAST(sum(CAST(round(m0 * m0, 12) AS DECIMAL(38,18))) AS DOUBLE) AS _s0,
           CAST(sum(CAST(round(m1 * m1, 12) AS DECIMAL(38,18))) AS DOUBLE) AS _s1,
           CAST(sum(CAST(round((m0 - m1) * (m0 - m1), 12) AS DECIMAL(38,18)))
                AS DOUBLE) AS _l2
    FROM paired GROUP BY 1
)
SELECT label,
       CAST(n0 AS BIGINT) AS n0,
       CAST(n1 AS BIGINT) AS n1,
       round(_dot / (sqrt(_s0) * sqrt(_s1)), 6) AS centroid_cos,
       round(sqrt(_l2), 6) AS l2_shift
FROM agg
ORDER BY label
"""


ROUND10_QUERIES = {
    "text_zipf_fit": text_zipf_fit,
    "emb_drift_shift": emb_drift_shift,
}
ROUND10_ORACLES = {
    "text_zipf_fit": TEXT_ZIPF_FIT_SQL,
    "emb_drift_shift": EMB_DRIFT_SHIFT_SQL,
}
