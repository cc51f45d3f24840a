#!/usr/bin/env python
"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed to full materialization (count of a write-shaped
collect), after a warm-up pass of the session (JVM + parquet footer
caches are shared, matching a long-running cluster's steady state).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "olap_star_join",
    "a1_tumbling_window_15min",
    "j1_incremental_antijoin",
    "j2_enrich_broadcast",
    "j8_asof_backward",
    "j10_fuzzy_match",
    "w1_daily_cumulative",
    "pipe_wt_publish",
    "pipe_bt_publish_unmatched",
    "pipe_gs_agg",
    "a1_streaming_parity",
    "dedup_exact",
    "dedup_embedding_cosine",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "dedup_simhash",
    "text_profile",
    "text_bpe_tokens",
    "text_langid_ngram",
    "text_winnow_fingerprint",
    "text_repetition",
    "corpus_curation",
    "sim_knn_bruteforce",
    "sim_ann_lsh",
    "sim_ann_ivf",
    "mm_media_features",
    "sessionize_batch",
    "text_tfidf_top_terms",
    "cur_decontaminate",
    "cur_chunk_documents",
    "q3_shipping_priority",
    "q18_large_volume_customers",
    "evt_funnel",
    "text_pii_scrub",
    "cur_keep_best_per_cluster",
    "sim_semantic_dedup",
    "text_unigram_logprob",
    "inc_agg_maintenance",
    "evt_time_window_join",
    "evt_retention",
    "text_top_tokens",
    "emb_int8_quantize",
    "q10_returned_items",
    "j_asof_nearest",
    "cur_token_budget",
    "dedup_incremental_batch",
    "evt_json_extract",
    "evt_pivot",
    "li_unpivot",
    "evt_value_correlation",
    "j_salted_skew_join",
    "q13_order_count_distribution",
    "q15_top_supplier",
    "q19_disjunctive_pricing",
    "agg_group_medians",
    "agg_approx_sketches",
    "geo_radius_join",
    "emb_label_centroids",
    "cur_substring_decontaminate",
    "evt_markov_transitions",
    "doc_length_histogram",
    "evt_rolling_active_users",
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_stock",
    "q12_ship_priority_class",
    "q16_parts_supplier",
    "q17_small_quantity_revenue",
    "q20_potential_promotion",
    "q21_suppliers_kept_waiting",
    "q22_sales_opportunity",
    "dq_profile",
    "dq_referential_orphans",
    "mb_copurchase_lift",
    "w3_percent_rank_cume",
    "evt_gap_stats",
    "text_top_bigrams",
    "cur_deterministic_shuffle",
    "dedup_incremental_minhash",
    "emb_kmeans_assign",
    "evt_scd2_intervals",
    "text_containment",
    "evt_zorder_audit",
    "cur_mixture_resample",
    "dq_schema_drift",
    "cur_winsorize",
    "evt_resample_ffill",
    "evt_top_paths",
    "dq_freshness",
    "evt_anomaly_mad",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from atd_data_lake_spark.session import get_spark
    from atd_data_lake_spark.queries import QUERIES

    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )

    # warm the JVM / IO path and the Python-worker pool once (a live
    # cluster has both standing; first-use costs are not query costs)
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    import pandas as _pd

    spark.range(1000, numPartitions=int(cpus) if cpus != "*" else 8).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    # Three full sweeps over the query list, min per query.  Interleaving
    # the repeats (sweep-major, not query-major) decorrelates this host's
    # multi-second noisy-neighbor stalls from any single query: back-to-back
    # repeats all land in the same stall window, sweep-spaced repeats don't.
    runs: dict[str, list[float]] = {name: [] for name in HEADLINE}
    rows: dict[str, int] = {}
    errors: dict[str, str] = {}
    for sweep in range(3):
        for name in HEADLINE:
            if name in errors:
                continue  # failed once → don't burn two more sweeps on it
            t0 = time.perf_counter()
            try:
                rows[name] = QUERIES[name](spark, sf_dir).count()
                runs[name].append(time.perf_counter() - t0)
            except Exception as e:  # noqa: BLE001 — one bad query must not
                # zero out the whole round's numbers (round 2 lost ALL bench
                # data to a single AnalysisException)
                errors[name] = str(e).split("\n")[0][:300]
            # operators persist multi-consumer intermediates; drop them so
            # one query's cache never skews the next query's measurement
            spark.catalog.clearCache()
    ok = [name for name in HEADLINE if name not in errors]
    timings = {name: round(min(runs[name]), 3) for name in ok}
    # median-of-3 alongside min: the delta between them shows how much of a
    # round-over-round change is host noise vs real (this host has documented
    # multi-second noisy-neighbor stall windows)
    medians = {name: round(sorted(runs[name])[len(runs[name]) // 2], 3) for name in ok}
    for name in ok:
        print(
            f"# {name}: {timings[name]:.3f}s (median {medians[name]:.3f}s, "
            f"{rows[name]} rows)",
            file=sys.stderr,
        )
    for name, msg in errors.items():
        print(f"# {name}: ERROR {msg}", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "queries_median": medians,
                "value_median": round(sum(medians.values()), 3),
                "errors": errors,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
