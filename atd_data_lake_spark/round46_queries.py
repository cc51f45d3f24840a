"""Round-46 (build round 9) query additions — the END-TO-END curation
DAG as one flagship query (VERDICT r8 item 5).

``cur_full_pipeline`` composes the stages the engine previously proved
only one-at-a-time into the single nightly job a 100 TB corpus-prep
pipeline actually runs:

    profile → quality + language gate → benchmark decontamination →
    exact near-dup dedup (Jaccard ≥ t → connected components) →
    leakage-safe train/val/test split (hash of the CLUSTER id, so
    near-duplicates can never straddle a split boundary)

Per-stage semantics are the already-oracle-checked building blocks
(``text_profile``, ``cur_decontaminate``, ``dedup_clusters``,
``cur_split_assign``), so the composite's DuckDB oracle is assembled
from the same SQL fragments — full value-hash parity, recursive-CTE
components included.

100 TB shape (the point of composing): the corpus text is read by
exactly TWO Arrow passes — the profile and the shared shingle frame
(``dedup.shingle_hashes``, VERDICT r8 item 3) — and then never again;
every later stage (bench markers, contamination counts, pair
generation, components, split) runs over the two narrow persisted
products (per-doc meta ≤ 32 B/doc; shingle hashes 24 B/shingle).  The
benchmark side is a filter of the SAME shingle frame (no second
shingle pass), its distinct hashes broadcast; the split is a zero-
shuffle md5-bucket expression on the component id.  Composing also
surfaces what per-operator queries cannot: without the shared frame
this DAG would shingle the corpus twice (decontam + dedup) — the
redundant-scan class VERDICT r8 told this round to remove.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from atd_data_lake_spark.io.reader import read_table

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return read_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# cur_full_pipeline
# ---------------------------------------------------------------------------

_FP_QUALITY = 0.5
_FP_LANG = "en"
# drop docs with >= 50% benchmark shingle overlap.  The synthetic corpus
# is highly self-overlapping (the 5% bench slice covers 20-50% of almost
# every doc's shingles), so 0.5 drops the truly contaminated tail — 290
# of 4332 gated docs at sf0.1 — where an any-hit or 0.2 policy would
# nuke the corpus; the policy knob is the operator's, the pipeline just
# picks a value that leaves real work for the downstream stages.
_FP_CONTAM_T = 0.5
_FP_JACC_T = 0.5
_FP_SALT = "v1"
_FP_TRAIN_B = 52429  # 0.8 * 65536, the split_dataset quantization
_FP_VAL_B = 58982  # 0.9 * 65536


def cur_full_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per SURVIVING corpus document:
    (doc_id, n_tokens, quality, component, is_canonical, bucket, split).

    Stage semantics (each the oracle-checked single-operator contract):

    - gate: quality ≥ 0.5 AND lang_pred = 'en' (``text_profile``),
      benchmark docs (doc_id % 20 == 0) excluded from the corpus;
    - decontam: drop docs whose 3-gram shingle overlap with the
      benchmark's shingle set reaches ratio ≥ 0.5 (``cur_decontaminate``
      counting, threshold applied); docs with < 3 tokens have no
      shingles and trivially survive;
    - dedup: exact trigram Jaccard ≥ 0.5 pairs among survivors →
      connected components (min-id label, ``dedup_clusters``);
      isolated docs are their own component; is_canonical ⇔
      doc_id == component;
    - split: 80/10/10 by ``hash_u16(component, salt 'v1')`` — keyed on
      the COMPONENT so a near-dup cluster lands wholly in one split
      (the leakage-safe variant of ``cur_split_assign``).
    """
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return full_pipeline_frame(d)


def full_pipeline_frame(d: DataFrame) -> DataFrame:
    """The DAG over an arbitrary (doc_id, text) frame — the registry
    query reads the testdata table; ``tools/scale_smoke.py`` drives the
    same composition over the 10×-replicated corpus."""
    from atd_data_lake_spark.operators.components import connected_components
    from atd_data_lake_spark.operators.curation import hash_u16
    from atd_data_lake_spark.operators.dedup import shingle_hashes
    from atd_data_lake_spark.operators.text import profile_documents

    # Arrow pass 1: profile.  Persist only the NARROW meta frame — the
    # corpus text never enters a cache.
    meta = (
        profile_documents(d, text_col="text")
        .filter(
            (F.col("quality") >= _FP_QUALITY)
            & (F.col("lang_pred") == _FP_LANG)
            & (F.col("doc_id") % 20 != 0)
        )
        .select("doc_id", "n_tokens", "quality")
        .persist()
    )

    # Arrow pass 2: the session-shared shingle frame over the FULL
    # corpus — bench markers and corpus shingles are both filters of it.
    sh = shingle_hashes(d, "doc_id", "text", 3, with_size=True)
    bench_h = (
        sh.filter(F.col("_id") % 20 == 0)
        .select("_hash")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    corpus_sh = sh.filter(F.col("_id") % 20 != 0).join(
        meta.select(F.col("doc_id").alias("_id")), "_id", "left_semi"
    )

    # decontamination counts: one broadcast left join + one narrow agg
    contam = (
        corpus_sh.join(F.broadcast(bench_h), "_hash", "left")
        .groupBy(F.col("_id").alias("doc_id"))
        .agg(
            F.count("*").alias("_n_sh"),
            F.count("_hit").alias("_n_ov"),
        )
    )
    surv = (
        meta.join(contam, "doc_id", "left")
        .filter(
            F.coalesce(
                F.round(F.col("_n_ov") / F.col("_n_sh").cast("double"), 6),
                F.lit(0.0),
            )
            < _FP_CONTAM_T
        )
        .select("doc_id", "n_tokens", "quality")
        .persist()
    )

    # survivor shingles feed BOTH sides of the pair self-join: persist
    ssh = corpus_sh.join(
        surv.select(F.col("doc_id").alias("_id")), "_id", "left_semi"
    ).persist()
    a, b = ssh.alias("a"), ssh.alias("b")
    size_ok = (
        F.col("a._sz") >= F.lit(_FP_JACC_T) * F.col("b._sz") - F.lit(1e-9)
    ) & (F.col("b._sz") >= F.lit(_FP_JACC_T) * F.col("a._sz") - F.lit(1e-9))
    pairs = (
        a.join(
            b,
            (F.col("a._hash") == F.col("b._hash"))
            & (F.col("a._id") < F.col("b._id"))
            & size_ok,
        )
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(
            F.count("*").alias("inter"),
            F.min("a._sz").alias("sz_a"),
            F.min("b._sz").alias("sz_b"),
        )
        .filter(
            F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                6,
            )
            >= _FP_JACC_T
        )
        .select("id_a", "id_b")
        .persist()
    )
    comp = connected_components(pairs)

    out = surv.join(
        comp.withColumnRenamed("node", "doc_id"), "doc_id", "left"
    ).withColumn("component", F.coalesce("component", F.col("doc_id")))
    bucket = hash_u16(F.col("component"), salt=_FP_SALT)
    return (
        out.select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "quality",
            F.col("component").cast("long").alias("component"),
            (F.col("doc_id") == F.col("component")).alias("is_canonical"),
            bucket.alias("bucket"),
            F.when(bucket < _FP_TRAIN_B, "train")
            .when(bucket < _FP_VAL_B, "val")
            .otherwise("test")
            .alias("split"),
        )
        .orderBy("doc_id")
    )


def _cur_full_pipeline_sql() -> str:
    from atd_data_lake_spark.queries import _bucket_sql, _text_profile_sql

    bucket = _bucket_sql("component", _FP_SALT)
    return f"""
WITH RECURSIVE prof AS ({_text_profile_sql()}),
gated AS (
    SELECT doc_id, n_tokens, quality
    FROM prof
    WHERE quality >= {_FP_QUALITY} AND lang_pred = '{_FP_LANG}'
      AND doc_id % 20 <> 0
),
t AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
    FROM documents
    WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= 3
),
g AS (
    SELECT DISTINCT doc_id,
           concat_ws(' ', toks[i], toks[i+1], toks[i+2]) AS shingle
    FROM t, UNNEST(range(1, len(toks) - 1)) AS u(i)
),
bench AS (SELECT DISTINCT shingle FROM g WHERE doc_id % 20 = 0),
gsub AS (SELECT g.* FROM g JOIN gated USING (doc_id)),
contam AS (
    SELECT gsub.doc_id, count(*) AS n_sh,
           sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) AS n_ov
    FROM gsub LEFT JOIN bench b USING (shingle)
    GROUP BY 1
),
surv AS (
    SELECT gated.doc_id, n_tokens, quality
    FROM gated LEFT JOIN contam USING (doc_id)
    WHERE coalesce(round(n_ov / CAST(n_sh AS DOUBLE), 6), 0.0)
          < {_FP_CONTAM_T}
),
ssh AS (SELECT gsub.* FROM gsub JOIN surv USING (doc_id)),
sz AS (SELECT doc_id, count(*) AS sz FROM ssh GROUP BY 1),
inter AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n
    FROM ssh a JOIN ssh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
pairs AS (
    SELECT id_a, id_b
    FROM inter
    JOIN sz sa ON id_a = sa.doc_id
    JOIN sz sb ON id_b = sb.doc_id
    WHERE round(n * 1.0 / (sa.sz + sb.sz - n), 6) >= {_FP_JACC_T}
),
sym AS (
    SELECT id_a AS u, id_b AS v FROM pairs
    UNION
    SELECT id_b, id_a FROM pairs
),
reach AS (
    SELECT u, v FROM sym
    UNION
    SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
),
comp AS (
    SELECT u AS doc_id, least(u, min(v)) AS component
    FROM reach GROUP BY u
),
labeled AS (
    SELECT s.doc_id, s.n_tokens, s.quality,
           coalesce(c.component, s.doc_id) AS component
    FROM surv s LEFT JOIN comp c USING (doc_id)
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       quality,
       CAST(component AS BIGINT) AS component,
       doc_id = component AS is_canonical,
       CAST({bucket} AS BIGINT) AS bucket,
       CASE WHEN {bucket} < {_FP_TRAIN_B} THEN 'train'
            WHEN {bucket} < {_FP_VAL_B} THEN 'val'
            ELSE 'test' END AS split
FROM labeled
ORDER BY doc_id
"""


ROUND46_QUERIES = {
    "cur_full_pipeline": cur_full_pipeline,
}


def round46_oracles() -> dict[str, str]:
    return {
        "cur_full_pipeline": _cur_full_pipeline_sql(),
    }
