"""Benchmark harness (driver contract): runs the engine's headline
queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Timing is end-to-end per query: logical plan construction + Catalyst +
execution + driver collect. A warmup query runs first so JVM/codegen
startup is not billed to the first headline query.

Output layout (round-9 fix — BENCH_r08.json lost 37 query timings):
the driver captures only the LAST ~2000 characters of stdout and
parses the final line, so a single full-name JSON line (~3 KB at ~100
queries) gets its head truncated and fails to parse. We therefore
print TWO lines:

  1. a full-name JSON line (greppable in local logs, feeds
     tools/bench_compare.py), then
  2. the driver-facing metric line LAST, with each query keyed by its
     short alias from ``ALIASES`` below and timings at 3 significant
     figures — ~1.5 KB, safely inside the capture window.

``ALIASES`` is the committed decode table (short -> full is its
inverse); tests/test_bench_contract.py pins uniqueness, coverage, and
the line-length budget.

Host-noise metadata (round 14 — two consecutive rounds of ±50%
host-level noise incidents cost judge-side A/B reruns to adjudicate):
both lines carry an ``env`` object — on the metric line with
abbreviated keys to fit the capture budget: ``lb``/``la`` are the
1-minute loadavg before/after the run, ``ctl`` is the percent drift of
a 3-query CONTROL rerun (the first three headline queries re-timed at
the END of the run against their own start-of-run timings; the
full-name line spells these ``load_before``/``load_after``/
``ctl_delta_pct``). A large positive ctl means the host slowed down
DURING the run; comparing one round's control timings to the previous
artifact's exposes between-run drift. A ±50% headline swing with a
matching ctl/load signature is host noise, not code — readable from
the artifact alone.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one per engine pillar — scan+agg (Q1), multi-join agg,
# ranking window, top-1-per-group, order-aware CDC, top-k scan, and the
# scale extensions (dedup, similarity) once registered. Maps full
# registry name -> short alias used in the driver-facing metric line.
ALIASES = {
    "pricing_summary": "pricing",
    "category_totals": "cat_tot",
    "customer_spend_ranking": "spend_rank",
    "top_spender_per_category": "top_spend",
    "scd_change_log": "scd_log",
    "recent_events_top100": "ev_top100",
    # multi-hop dim chains:
    "regional_supplier_volume": "reg_supvol",
    "returned_revenue_by_nation": "ret_rev",
    # rollup / profiling / skew / join-mode surfaces:
    "revenue_rollup_region_nation": "rev_rollup",
    "salted_segment_revenue": "salt_rev",
    "event_funnel": "ev_funnel",
    "enrich_strict_vs_dedup": "enrich_sd",
    # event-time windows (batch mode of the streaming operators):
    "tumbling_counts": "tumbling",
    "sliding_counts": "sliding",
    "session_windows": "sessions",
    # temporal + sampling:
    "asof_last_click_before_purchase": "asof_click",
    # dedup family:
    "dedup_exact": "dd_exact",
    "dedup_minhash_lsh": "dd_lsh",
    "dedup_incremental_lsh": "dd_inc",
    "dedup_simhash": "dd_sim",
    "dedup_ngram_containment": "dd_contain",
    "boilerplate_line_strip": "boiler",
    "doc_winnowing_fingerprints": "winnow_fp",
    "winnowing_overlap_pairs": "winnow_ov",
    "source_lang_pivot": "src_lang",
    "churned_high_balance_customers": "churned",
    "quality_linear_scores": "qual_lin",
    "dedup_cluster_assignment": "dd_cc",
    "dedup_canonical_by_quality": "dd_canon",
    # embedding_near_dup is the scale-safe high-threshold config; the
    # low-threshold recall study and the sampled exact baseline are
    # retired to tests/test_retired.py (quadratic studies by design)
    "embedding_near_dup": "emb_nd",
    "semantic_dedup": "sem_dd",
    "semantic_dedup_reordered": "sem_reord",
    "semantic_dedup_incremental": "sem_dd_inc",
    "similarity_topk": "topk",
    "semantic_doc_retrieval": "rag",
    "similarity_topk_ivf_indexed": "topk_ivfx",
    "similarity_topk_ivf_appended": "topk_ivfa",
    "similarity_topk_pq": "topk_pq",
    "similarity_topk_ivfpq": "topk_ivfpq",
    "similarity_topk_ivfpq_rerank": "topk_rr",
    "similarity_topk_ivfpq_appended": "topk_pqapp",
    "hard_negative_topk": "hardneg",
    "text_quality": "txt_qual",
    "text_token_stats": "txt_tok",
    # curation passes:
    "corpus_vocab_topk": "vocab",
    "tfidf_top_terms": "tfidf",
    "text_repetition_filter": "txt_rep",
    "chunk_dedup_rebuild": "chunk_dd",
    "span_dedup_incremental": "span_inc",
    "text_pii_scrub": "pii",
    "benchmark_decontamination": "decontam",
    "benchmark_span_scrub": "span_scrub",
    "cross_corpus_decontamination": "xdecontam",
    "benchmark_semantic_decontamination": "sem_decontam",
    "dsir_importance_selection": "dsir",
    "sequence_packing": "seqpack",
    "training_set_curation_v2": "curation2",
    "split_leakage_audit": "leak_audit",
    "source_cap_sample": "src_cap",
    "source_temperature_mix": "src_temp",
    "source_epoch_mix": "src_epoch",
    "corpus_bigram_merges": "bigrams",
    "bpe_merge_table": "bpe",
    "bpe_char_merge_table": "bpe_ch",
    "bpe_token_ids": "bpe_ids",
    "text_token_diversity": "txt_div",
    "text_perplexity_buckets": "ppl_bkt",
    "text_html_strip": "html",
    "source_reputation": "src_rep",
    "embedding_cluster_profile": "clus_prof",
    "embedding_dim_stats": "emb_stats",
    "embedding_outliers": "emb_out",
    "scd2_state_history": "scd2",
    # multimodal:
    "media_dhash_canonicals": "med_dhash",
    "training_set_curation_dsir": "cur_dsir",
    "video_dhash_canonicals": "vid_dhash",
    "audio_dhash_canonicals": "aud_dhash",
    "media_frame_sample": "med_frames",
    "media_metadata_filter": "med_meta",
    "media_feature_extract": "med_feat",
    # reference-fidelity small queries (cheap; tracked so the whole
    # registry has a round-over-round wall-time series):
    "blob_parse_roundtrip": "blob",
    "customer_details_nested": "cust_nest",
    "dimension_current_state": "dim_state",
    "excel_serial_dates": "xl_dates",
    "json_props_extract": "json_props",
    "event_user_distinct": "ev_users",
    "user_retention_set_ops": "retention",
    "stratified_lang_rebalance": "strat_lang",
    "text_lang_id": "lang_id",
    # round-8 additions:
    "interval_window_attribution": "interval",
    "lineitem_column_profile": "col_prof",
    "shipping_priority_top10": "ship_top10",
    "order_priority_lateness": "ord_late",
    "view_click_attribution": "attrib",
    "nation_market_share": "mkt_share",
    "daily_value_trend": "daily",
    "small_quantity_order_revenue": "smallqty",
    "customer_spend_deciles": "deciles",
    "top_revenue_suppliers": "top_supp",
    "promo_part_suppliers": "promo",
}

HEADLINE = list(ALIASES)

# Retired-but-tracked rows: queries rotated OUT of the driver-facing
# registry (the 2x-gate-cap ceiling; their full DuckDB oracles keep
# running in tests/test_retired.py) whose operator core is still live
# inside registered queries. Timing them preserves the round-over-round
# wall-time series across rotation swaps — round 15's alias swap seated
# audio_dhash_canonicals by retiring dedup_ngram_jaccard, which left
# its posting-list core (shared with cross_corpus_decontamination, and
# still being optimized) with no bench series. These rows are ADDED to
# the queries map only; the headline total keeps its long-standing
# meaning (sum over the registered registry), so totals stay comparable
# round over round. See ROTATION.md for the swap ledger.
RETIRED_TRACKED = {
    "dedup_ngram_jaccard": "dd_jacc",
}

# Control queries for the end-of-run noise probe: cheap, stable,
# structurally diverse (scan+agg, multi-join agg, window), and timed
# FIRST in the headline loop — so (end rerun) / (start timing) isolates
# host drift across the run's full span.
CONTROLS = HEADLINE[:3]


def _loadavg() -> float | None:
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:  # pragma: no cover - platform without getloadavg
        return None


def sig3(x: float) -> float:
    """3 significant figures (not 3 decimals): 0.8391->0.839,
    3.132->3.13, 10.012->10.0 — keeps the metric line compact while
    staying inside bench noise (run-to-run variance is +/-15%)."""
    if x == 0:
        return 0.0
    from math import floor, log10

    return round(x, 2 - int(floor(log10(abs(x)))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry_mod
    from py_data_pipeline_app_spark.session import get_spark

    spark = get_spark("bench")
    qs = entry_mod.queries()

    load_before = _loadavg()
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

    # headline total = the REGISTERED rows only (its round-over-round
    # meaning); retired-tracked rows are timed after and ride only in
    # the queries map
    total = round(sum(timings.values()), 3)

    from py_data_pipeline_app_spark.plans.queries import RETIRED_QUERIES

    for name, _alias in RETIRED_TRACKED.items():
        fn = RETIRED_QUERIES.get(name)
        if fn is None:
            continue
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf

    # End-of-run control rerun: the same 2-run-min protocol on the
    # first three headline queries. Drift vs their start-of-run
    # timings separates host noise from code deltas IN the artifact.
    ctl_start = sum(timings[n] for n in CONTROLS if n in timings)
    ctl_end = 0.0
    for name in CONTROLS:
        fn = qs.get(name)
        if fn is None or name not in timings:
            continue
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        ctl_end += best
    env = {
        "load_before": load_before,
        "load_after": _loadavg(),
        "ctl_delta_pct": (
            round(100.0 * (ctl_end / ctl_start - 1.0), 1) if ctl_start else None
        ),
    }

    # Line 1 (local logs / bench_compare): full names, 3-decimal timings.
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_fullnames",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
                "env": env,
            }
        )
    )
    # Line 2 (LAST — the driver parses the final line from a ~2000-char
    # tail capture): aliased names + 3-sig-fig timings, compact JSON.
    alias_of = {**ALIASES, **RETIRED_TRACKED}
    compact = {alias_of[n]: sig3(t) for n, t in timings.items()}
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "sf": sf_val,
                "env": {
                    "lb": env["load_before"],
                    "la": env["load_after"],
                    "ctl": env["ctl_delta_pct"],
                },
                "queries": compact,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
