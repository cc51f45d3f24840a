"""Shuffle-budget regression guard: every headline query's physical plan
must stay within its recorded exchange budget.

PLANS.md documents each query's exchange count; this test turns those
numbers into a ceiling so a future edit cannot silently add a shuffle
(the error at 100 TB that a green sf0.001 correctness run would never
reveal).  Budgets are the CURRENT plan's count — tightening is free,
loosening must be a deliberate edit here.

Counting matches tools/plan_report.py: `Exchange` nodes in the executed
(pre-AQE-finalization) plan string.  Counts can only differ from
PLANS.md (generated at sf0.1) where AQE or broadcast thresholds pick a
different join at the test SF — budgets below are the max of both.
"""

from __future__ import annotations

import re

import pytest

from atd_data_lake_spark.queries import QUERIES

# query → max allowed Exchange nodes (from PLANS.md, sf0.1 plans)
EXCHANGE_BUDGETS = {
    "q1_pricing_summary": 1,
    "olap_star_join": 2,
    "a1_tumbling_window_15min": 1,
    "j1_incremental_antijoin": 1,
    "j2_enrich_broadcast": 1,
    "j8_asof_backward": 1,
    "j10_fuzzy_match": 1,
    "w1_daily_cumulative": 1,
    "pipe_wt_publish": 1,
    "pipe_bt_publish_unmatched": 3,
    "pipe_gs_agg": 1,
    "a1_streaming_parity": 1,
    "dedup_exact": 1,
    "dedup_embedding_cosine": 1,
    # verified shape: bucket groupBy + pair groupBy (2), the fan_out
    # repartition before the candidate-pruned shingle stage (1), the two
    # candidate-driven verify joins' aggregation (2), plus ONE exchange
    # on the size-gated oversized-bucket fallback branch (r7: in-partition
    # pair expansion for buckets <= cap, streamed self-join above it) —
    # that branch is empty on every non-degenerate corpus, so its
    # exchange moves zero rows at runtime
    "dedup_minhash_lsh": 6,
    "dedup_ngram_jaccard": 3,
    "dedup_clusters": 2,
    "dedup_simhash": 3,
    "text_profile": 1,
    "text_bpe_tokens": 0,
    "text_langid_ngram": 1,
    "text_winnow_fingerprint": 1,
    "text_repetition": 1,
    "corpus_curation": 2,
    "sim_knn_bruteforce": 2,
    "sim_ann_lsh": 3,
    "sim_ann_ivf": 2,
    "mm_media_features": 1,
    "sessionize_batch": 1,
    "text_tfidf_top_terms": 4,
    "cur_decontaminate": 4,
    "cur_chunk_documents": 0,
    "q3_shipping_priority": 1,
    "q18_large_volume_customers": 2,
    "evt_funnel": 5,
    "text_pii_scrub": 0,
    "cur_keep_best_per_cluster": 4,
    "sim_semantic_dedup": 2,
    # 4th exchange = the 1-row corpus-total aggregate (replaces what was
    # a full extra token-stream scan — a deliberate trade, see operator)
    "text_unigram_logprob": 4,
    "inc_agg_maintenance": 3,
    "evt_time_window_join": 4,
    "evt_retention": 3,
    "text_top_tokens": 2,
    "emb_int8_quantize": 1,
    "q10_returned_items": 5,
    "j_asof_nearest": 4,
    "cur_token_budget": 2,
    "dedup_incremental_batch": 6,
    "evt_json_extract": 2,  # agg exchange + output-order range exchange
    "evt_pivot": 3,
    "li_unpivot": 2,
    "evt_value_correlation": 2,
    "j_salted_skew_join": 5,
    "q13_order_count_distribution": 4,
    "q15_top_supplier": 6,
    "q19_disjunctive_pricing": 2,
    "agg_group_medians": 2,
    "agg_approx_sketches": 2,
    "geo_radius_join": 4,
    "emb_label_centroids": 2,
    "cur_substring_decontaminate": 1,
    "evt_markov_transitions": 4,
    "doc_length_histogram": 3,
    "evt_rolling_active_users": 6,
    # round-3 additions: remaining TPC-H shapes + data-quality ops
    "q2_min_cost_supplier": 3,
    "q4_order_priority": 2,
    "q7_volume_shipping": 4,
    "q8_market_share": 4,
    "q9_product_profit": 2,
    "q11_important_stock": 4,
    "q12_ship_priority_class": 2,
    "q16_parts_supplier": 4,
    "q17_small_quantity_revenue": 2,
    "q20_potential_promotion": 3,
    "q21_suppliers_kept_waiting": 4,
    "q22_sales_opportunity": 3,
    # 5 per-column branches × (distinct pre-agg + final 1-row agg)
    # exchanges — each moves one column's distinct values then ONE row;
    # the single-agg alternative has 2 exchanges but Expands every row
    # 6×, measured 8× slower at sf0.1 (see operator docstring)
    "dq_profile": 20,
    "dq_referential_orphans": 4,
    # the basket subtree is persisted and computes ONCE at runtime; the
    # pre-execution plan string prints its lineage under each consumer,
    # so the static count over-reports (real shuffle count ≈ 4)
    # round-4 rewrite: pair+singleton+sentinel rows union into ONE
    # groupBy — baskets shuffle + combined-counts shuffle (deduped
    # cache accounting; was 8 under the triple-aggregation plan)
    # 6 DISJOINT-slice shuffles, not 6 passes: one baskets shuffle
    # (lineitem→l_orderkey, AQE-reused by every slice) + the pair-counts
    # exchange + the singleton margin exchange + the 1-row n_orders
    # global aggregate (≤ #partitions partial rows — the r9 sentinel
    # union shape routed this count through the shared exchange, but its
    # executed plan re-evaluated every union branch per consumer, so the
    # extra 1-row exchange buys strictly less compute; r10 slice
    # rewrite, see basket_count_slices) + the output range sort + the
    # per-part cache-build exchange. Deliberately raised 2→5 (r8,
    # persists dropped) →6 (r10, direct slices).
    "mb_copurchase_lift": 6,
    "w3_percent_rank_cume": 2,
    "evt_gap_stats": 2,
    "text_top_bigrams": 2,
    "cur_deterministic_shuffle": 3,
    # incremental twin: adds the standing/incoming union pass feeding
    # the verify shingle stage, plus the candidate-bounded replay-id
    # dedup exchange (dropDuplicates before shingling)
    "dedup_incremental_minhash": 8,
    # round-5 additions
    "emb_kmeans_assign": 0,  # model-as-literals: assignment must never shuffle
    "evt_scd2_intervals": 1,  # both row_number windows share one Exchange
    # shingle subtree (1 repartition exchange) prints under both self-join
    # sides + broadcast; runtime shuffles ≈ 3 (shingle, broadcast, pair agg)
    "text_containment": 5,
    "evt_zorder_audit": 1,  # key is scan-stage arithmetic; audit agg only
    # source-count agg + 1-row scale agg + threshold broadcast back; the
    # fact side never shuffles
    "cur_mixture_resample": 4,
    # 3 columns x (distinct pre-agg on (snap,col) + snap re-agg + 1-row
    # collapse) — every exchange carries <=2 rows after partial agg
    "dq_schema_drift": 9,
    # percentile agg over (source) groups + broadcast back; fact never shuffles
    "cur_winsorize": 2,
}


@pytest.mark.parametrize("name", sorted(EXCHANGE_BUDGETS))
def test_exchange_budget(spark, sf_dir, name):
    # a prior test's persisted intermediate makes the plan print the
    # cached subtree's exchanges through InMemoryTableScan — count each
    # query's OWN plan, not its neighbors' cache residue
    spark.catalog.clearCache()
    from atd_data_lake_spark.plancheck import count_exchanges

    df = QUERIES[name](spark, sf_dir)
    # count through plancheck.dedupe_cached: a frame persisted once but
    # referenced N times prints its cached subtree N times, while the
    # runtime materializes it once (same accounting as plan_report.py)
    exchanges = count_exchanges(df)
    assert exchanges <= EXCHANGE_BUDGETS[name], (
        f"{name}: {exchanges} exchanges > budget {EXCHANGE_BUDGETS[name]} — "
        "a shuffle crept in; fix the plan or deliberately raise the budget"
    )
