"""Benchmark harness (driver contract): runs the engine's headline
queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Timing is end-to-end per query: logical plan construction + Catalyst +
execution + driver collect. A warmup query runs first so JVM/codegen
startup is not billed to the first headline query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one per engine pillar — scan+agg (Q1), multi-join agg,
# ranking window, top-1-per-group, order-aware CDC, top-k scan, and the
# scale extensions (dedup, similarity) once registered.
HEADLINE = [
    "pricing_summary",
    "category_totals",
    "customer_spend_ranking",
    "top_spender_per_category",
    "scd_change_log",
    "recent_events_top100",
    "event_type_breakdown",
    # multi-hop dim chains:
    "regional_supplier_volume",
    "returned_revenue_by_nation",
    # rollup / profiling / skew / join-mode surfaces:
    "revenue_rollup_region_nation",
    "salted_segment_revenue",
    "event_value_quantiles",
    "event_value_histogram",
    "event_funnel",
    "enrich_strict_vs_dedup",
    # event-time windows (batch mode of the streaming operators):
    "tumbling_counts",
    "sliding_counts",
    "session_windows",
    # temporal + sampling:
    "asof_last_click_before_purchase",
    "dataset_split_profile",
    # extensions (registered in plans/queries.py as they land):
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_incremental_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_ngram_containment",
    "boilerplate_line_strip",
    "doc_winnowing_fingerprints",
    "winnowing_overlap_pairs",
    "source_lang_pivot",
    "churned_high_balance_customers",
    "quality_linear_scores",
    "dedup_cluster_assignment",
    "dedup_cluster_assignment_star",
    # embedding_near_dup is the scale-safe high-threshold config; the
    # low-threshold recall study (embedding_near_dup_lowt) is gate-only
    # by design — its candidate set is quadratic and would dominate the
    # round-over-round total without informing it
    "embedding_near_dup",
    "semantic_dedup",
    "similarity_topk",
    "semantic_doc_retrieval",
    "similarity_topk_ivf",
    "similarity_topk_ivf_indexed",
    "similarity_topk_ivf_appended",
    "similarity_topk_pq",
    "similarity_topk_ivfpq",
    "similarity_topk_ivfpq_appended",
    "hard_negative_topk",
    "text_quality",
    "text_token_stats",
    # curation passes:
    "corpus_vocab_topk",
    "tfidf_top_terms",
    "text_repetition_filter",
    "chunk_dedup_rebuild",
    "span_dedup_incremental",
    "text_pii_scrub",
    "benchmark_decontamination",
    "benchmark_span_scrub",
    "cross_corpus_decontamination",
    "sequence_packing",
    "training_set_curation",
    "training_set_curation_leakage_safe",
    "training_set_curation_v2",
    "split_leakage_audit",
    "source_cap_sample",
    "source_temperature_mix",
    "source_epoch_mix",
    "corpus_bigram_merges",
    "text_token_diversity",
    "text_perplexity_buckets",
    "text_html_strip",
    "source_reputation",
    "embedding_dim_stats",
    "embedding_outliers",
    "scd2_state_history",
    # multimodal:
    "media_payload_profile",
    "media_feature_topk",
    "media_frame_sample",
    "media_resize_profile",
    "media_metadata_filter",
    "media_feature_extract",
    # reference-fidelity small queries (cheap; tracked so the whole
    # registry minus the two documented quadratic studies has a
    # round-over-round wall-time series):
    "blob_parse_roundtrip",
    "customer_details_nested",
    "dimension_current_state",
    "excel_serial_dates",
    "json_props_extract",
    "event_user_distinct",
    "user_retention_set_ops",
    "stratified_lang_rebalance",
    "text_lang_id",
    # round-8 additions:
    "interval_window_attribution",
    "lineitem_column_profile",
    "shipping_priority_top10",
    "order_priority_lateness",
    "view_click_attribution",
    "nation_market_share",
    "daily_value_trend",
    "small_quantity_order_revenue",
    "customer_spend_deciles",
    "top_revenue_suppliers",
    "promo_part_suppliers",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry_mod
    from py_data_pipeline_app_spark.session import get_spark

    spark = get_spark("bench")
    qs = entry_mod.queries()

    # Warmup: trivial count to pay JVM/codegen startup once.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    # One full-plan execution per run via the noop sink (all operators and
    # projections execute; no driver-transfer cost skews the measurement).
    # Two runs, report the min: run 1 pays whole-stage-codegen compilation,
    # run 2 is the steady-state throughput a long-lived cluster would see.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
