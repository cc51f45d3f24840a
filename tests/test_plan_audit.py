"""Plan audit: no query may plan a CartesianProduct, and nested-loop
joins are forbidden except where a broadcast cross join against a
literal 1-row dimension is the intended plan.  This is the scale guard —
a cartesian that is invisible at sf0.001 is fatal at 100 TB.
"""

from __future__ import annotations

import pytest

from atd_data_lake_spark.queries import QUERIES

# Intentional BroadcastNestedLoopJoin: publish_agg attaches a 1-row
# device frame; unigram_logprob attaches the 1-row corpus-total — both
# (atd_device_id, primary_st, cross_st) device dim via
# crossJoin(broadcast(...)) — an O(n) pass-through, the right plan for a
# single-row dimension (pipelines/gs.py publish_agg).
BNLJ_ALLOWED = {
    "pipe_gs_publish",
    "text_unigram_logprob",
    # salted_join replicates the SMALL side against the 8-row salt range
    # (skew.py:32) — a bounded broadcast fan-out, not a data cross join
    "j_salted_skew_join",
    # scalar-subquery broadcasts: each crossJoins a 1-ROW aggregate
    # (q11 HAVING threshold; q22 global avg balance; market-basket
    # total order count) — the O(n) pass-through shape, same as
    # pipe_gs_publish
    "q11_important_stock",
    "q22_sales_opportunity",
    "mb_copurchase_lift",
    # the 1-ROW mixture-scale aggregate crossJoins the per-source count
    # frame (≤ #sources rows) — broadcast pass-through, not a data cross
    "cur_mixture_resample",
    # the day-grid scaffold: distinct users crossJoin the exploded
    # global-span day sequence (≤ |days| rows from a 1-ROW min/max agg) —
    # the grid IS the output shape, not a data×data cross
    "evt_resample_ffill",
    # the 10-row literal bin scaffold crossJoins the stream×period totals
    # (≤ 2·|streams| rows) so empty bins smooth instead of vanish
    "dq_psi_drift",
    # 1-row census crossJoins the 1-row triangle total; 1-row global
    # minute-span crossJoins the per-type sums — broadcast pass-throughs
    "graph_triangle_count",
    "evt_burstiness",
    # 1-row anonymity floor / digit total crossJoin class-bounded frames
    "dq_k_anonymity",
    "dq_benford",
    # the 1-ROW corpus-total (tot_r, tot_t) frame crossJoins the ≤256-row
    # bucket stats to form the log-ratio model — broadcast pass-through
    "cur_dsir_resample",
    # 1-row reference-date aggregate crossJoins the per-customer profile
    # (broadcast pass-through) before the RFM ntile windows
    "rfm_segments",
    # the 1-ROW corpus-stats frame (n_docs, avgdl) crossJoins the tf
    # posting stream (round24_queries.py text_bm25_topk) — broadcast
    # pass-through, same class as pipe_gs_publish
    "text_bm25_topk",
    # composes unigram_logprob_score, inheriting its 1-row corpus-total
    # crossJoin (round30_queries.py cur_perplexity_buckets)
    "cur_perplexity_buckets",
    # r7: 1-row broadcast pass-throughs — bigram/NB models crossJoin
    # their 1-ROW corpus-total (t / t_en,t_ot + 1-row prior); l-diversity
    # crossJoins its 1-row floor; temperature sampling its 1-row n_min
    "text_bigram_logprob",
    "text_nb_langid_eval",
    "dq_l_diversity",
    "cur_temperature_sample",
    # r7 PassJoin short-short completion: the ≤d-char class crossJoins
    # itself with the short side BROADCAST (bounded: distinct strings
    # ≤ |alphabet|^d; every emitted pair is a true output pair) —
    # operators/fuzzy.passjoin_pairs, and er_canonical_entities composes it
    "dedup_edit_distance",
    "er_canonical_entities",
    # r8: the Kneser-Ney model's 1-ROW distinct-pair total (npairs)
    # crossJoins the ≤|buckets|² pair-stat frame — broadcast
    # pass-through, same class as text_bigram_logprob's corpus total
    "text_kn_bigram_logprob",
    # r8: each unrolled GD iteration crossJoins the 1-ROW weight frame
    # onto the feature scan (broadcast pass-through ×4: 3 gradients +
    # the final loss) — the in-plan training loop's model distribution
    "dq_logreg_quality_train",
    # r9: 1-row broadcast pass-throughs — the KS test's (n1, n2) sample
    # totals crossJoin the |distinct values| cumulative frame; Benford's
    # 1-row digit total crossJoins the ≤9-row digit census; JS
    # divergence's (na, nb) corpus totals crossJoin the per-token frame
    "dq_ks_statistic",
    "dq_benford_digits",
    "text_js_divergence",
    # r9 wave fusion (guide §1.2): the funnel's three 1-ROW stage
    # counts crossJoin each other; recall eval's 1-ROW truth count
    # crossJoins the 2-row per-index hit counts — broadcast
    # pass-throughs replacing three sequential driver count() waves
    "evt_funnel_conversion",
    "sim_recall_eval",
    # r9: rewritten on the mb_copurchase_lift recipe — its 1-row basket
    # total crossJoins the scored pair frame (broadcast pass-through)
    "mb_affinity_npmi",
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_cartesian_or_nested_loop(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().toString()
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    if name not in BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} plans a nested-loop join"
        )
    # driver-canonicalizer guard: the external driver sorts raw result
    # tuples, so a nested output column (array/map/struct) crashes the
    # sweep (mm_media_features, round 1).  Registered projections must
    # be scalar-only; array-returning operators stay library-level.
    from pyspark.sql import types as T

    for field in df.schema.fields:
        assert not isinstance(
            field.dataType, (T.ArrayType, T.MapType, T.StructType)
        ), f"{name} output column {field.name} is nested ({field.dataType})"


# Queries over `documents` that derive everything from (doc_id, text):
# their scan must read exactly those two columns.  mapInPandas consumes
# whole rows, so a missing pre-projection silently reads the full table —
# invisible at sf0.001, ruinous on a wide 100 TB corpus.
DOC_PRUNED = [
    "text_profile",
    "text_bpe_tokens",
    "text_langid_ngram",
    "text_winnow_fingerprint",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "cur_decontaminate",
    "cur_chunk_documents",
    "text_tfidf_top_terms",
]


EMB_PRUNED = [
    "sim_knn_bruteforce",
    "sim_ann_lsh",
    "sim_ann_ivf",
    "dedup_embedding_cosine",
]


def _scan_columns(spark, sf_dir, name):
    import re

    plan = (
        QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, f"{name}: no parquet scan found in plan"
    return [sorted(f.split(":")[0] for f in s.split(",") if f) for s in schemas]


@pytest.mark.parametrize("name", DOC_PRUNED)
def test_documents_scan_prunes_to_id_and_text(spark, sf_dir, name):
    for cols in _scan_columns(spark, sf_dir, name):
        assert cols == ["doc_id", "text"], f"{name} scan reads {cols}"


@pytest.mark.parametrize("name", EMB_PRUNED)
def test_embeddings_scan_prunes_to_id_and_vector(spark, sf_dir, name):
    for cols in _scan_columns(spark, sf_dir, name):
        assert cols == ["embedding", "vec_id"], f"{name} scan reads {cols}"


def test_q19_disjunction_pushed_to_part_scan(spark, sf_dir):
    """Q19's raison d'être: the join-independent parts of each OR-branch
    must reach the scans, not evaluate post-join.  Assert the part
    scan's data filters mention brand/size and the lineitem scan's
    mention quantity."""
    plan = (
        QUERIES["q19_disjunctive_pricing"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    scans = plan.split("Scan parquet")
    part_scan = next(s for s in scans[1:] if "p_brand" in s[:800])
    li_scan = next(s for s in scans[1:] if "l_quantity" in s[:800])
    assert "PushedFilters" in part_scan[:2000]
    assert "Brand#" in part_scan[:2000]
    assert "l_quantity" in li_scan[:2000]
