"""10x scale rehearsal for the dedup/similarity/curation/media family.

The driver ships sf0.001/0.01/0.1; the 100-TB design claims are argued
from plan shape. This tool manufactures ONE more decade of scale
(sf1-equivalent: 50k documents / 20k embeddings) deterministically
from sf0.1 and measures every documents/embeddings-family query at
both scales, writing BENCH_sf1.json with per-query wall times and
scaling ratios. A family whose ratio is ~10 scales linearly; ratios
well above 10 flag superlinear behavior (df-cap / chunk-cap constants
failing at the next decade).

Scaling construction (in /tmp — the driver testdata is read-only):

- documents ×10: each copy k rewrites every token t -> "t" + "x{k}"
  (copy 0 keeps the original text). Token vocabularies of different
  copies are DISJOINT, so the corpus is 10 independent shards, each
  isomorphic to sf0.1: exact-dup groups, near-dup clusters, shingle
  document frequencies, and skew all replicate exactly; no cross-shard
  pairs are introduced (pair counts scale linearly, as they would in
  a real corpus 10x the size with the same dup rate).
- embeddings ×10: copy k applies the k-th power of a fixed cyclic
  dimension rotation. Rotations are orthogonal, so WITHIN a copy every
  pairwise cosine is bit-identical to sf0.1; ACROSS copies vectors
  decorrelate (generic vectors under disjoint rotations), so near-dup
  structure replicates without manufacturing 10-clone clusters.
- events ×10: copy k shifts event_id and user_id into a disjoint key
  range; timestamps are untouched. Per-user event sequences (funnels,
  sessions, SCD2 state runs, as-of matches, view→click pairs)
  replicate exactly; time-axis structure (daily rollups, interval
  windows) sees 10x the rows over the same calendar.
- TPC-H tables ×10: lineitem/orders/customer/supplier/part copies get
  disjoint key ranges (order, customer, supplier, part keys shifted);
  nation/region stay fixed, so per-nation aggregates see 10x volume —
  the realistic shape of a bigger business, and per-part averages
  (Q17) replicate per shard.

Run:  python tools/scale_rehearsal.py            # full family
      python tools/scale_rehearsal.py dedup_exact similarity_topk
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_BASE = "/root/testdata/sf0.1"
X10_DIR = "/tmp/sf1_rehearsal"
SCALE = 10
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_sf1.json")

FAMILY = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_incremental_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_cluster_assignment",
    "dedup_cluster_assignment_star",
    "dedup_canonical_by_quality",
    "embedding_near_dup",
    "semantic_dedup",
    "semantic_dedup_incremental",
    "semantic_dedup_reordered",
    "embedding_cluster_profile",
    "similarity_topk",
    "semantic_doc_retrieval",
    "similarity_topk_ivf",
    "similarity_topk_ivf_indexed",
    "similarity_topk_ivf_appended",
    "similarity_topk_pq",
    "similarity_topk_ivfpq",
    "similarity_topk_ivfpq_appended",
    "similarity_topk_ivfpq_rerank",
    "embedding_dim_stats",
    "embedding_outliers",
    "text_lang_id",
    "text_quality",
    "text_token_stats",
    "corpus_vocab_topk",
    "tfidf_top_terms",
    "text_repetition_filter",
    "chunk_dedup_rebuild",
    "span_dedup_incremental",
    "text_token_diversity",
    "text_perplexity_buckets",
    "text_perplexity_bigram",
    "text_perplexity_frozen_lm",
    "text_html_strip",
    "source_reputation",
    "source_cap_sample",
    "source_temperature_mix",
    "source_token_budget_mix",
    "source_epoch_mix",
    "corpus_bigram_merges",
    "bpe_merge_table",
    "bpe_encoded_corpus",
    "bpe_char_merge_table",
    "bpe_token_ids",
    "benchmark_decontamination",
    "benchmark_span_scrub",
    "cross_corpus_decontamination",
    "benchmark_semantic_decontamination",
    "dsir_importance_selection",
    "sequence_packing",
    "training_set_curation",
    "training_set_curation_leakage_safe",
    "training_set_curation_v2",
    "training_set_curation_semantic",
    "training_set_curation_dsir",
    "split_leakage_audit",
    "dataset_split_profile",
    "stratified_lang_rebalance",
    "media_payload_profile",
    "media_dhash_canonicals",
    "video_dhash_canonicals",
    "audio_dhash_canonicals",
    "media_feature_extract",
    "media_feature_topk",
    "media_frame_sample",
    "media_resize_profile",
    # round-8 additions
    "boilerplate_line_strip",
    "dedup_ngram_containment",
    "doc_winnowing_fingerprints",
    "winnowing_overlap_pairs",
    "hard_negative_topk",
    # events family (round 8: the x10 build now scales events too)
    "interval_window_attribution",
    "view_click_attribution",
    "daily_value_trend",
    "event_funnel",
    "scd2_state_history",
    "asof_last_click_before_purchase",
    # relational family (x10 TPC-H tables)
    "lineitem_column_profile",
    "pricing_summary",
    "shipping_priority_top10",
    "order_priority_lateness",
    "nation_market_share",
    "small_quantity_order_revenue",
    "returned_revenue_by_nation",
    "churned_high_balance_customers",
    "salted_segment_revenue",
    "customer_spend_deciles",
    "top_revenue_suppliers",
    "promo_part_suppliers",
]


def build_x10(spark) -> None:
    from pyspark.sql import functions as F

    marker = os.path.join(X10_DIR, "_SUCCESS_REHEARSAL")
    if os.path.exists(marker) and os.path.exists(
        os.path.join(X10_DIR, "events.parquet")  # round-8 table set
    ):
        return
    # a stale marker from a partial build must not survive a crash
    # mid-rebuild — clear it FIRST so a rerun always rebuilds fully
    if os.path.exists(marker):
        os.remove(marker)
    docs = spark.read.parquet(f"{SF_BASE}/documents.parquet")
    n_docs = docs.count()
    copies = []
    for k in range(SCALE):
        c = docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * n_docs))
        if k > 0:
            suffixed = F.array_join(
                F.transform(
                    F.split(F.col("text"), r"\s+"),
                    lambda t: F.concat(t, F.lit(f"x{k}")),
                ),
                " ",
            )
            c = c.withColumn("text", suffixed)
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.repartition(32).write.mode("overwrite").parquet(f"{X10_DIR}/documents.parquet")

    emb = spark.read.parquet(f"{SF_BASE}/embeddings.parquet")
    n_vec = emb.count()
    dim = len(emb.select("embedding").first()[0])
    ecopies = []
    for k in range(SCALE):
        c = emb.withColumn("vec_id", F.col("vec_id") + F.lit(k * n_vec))
        if k > 0:
            # k-th power of the +7 cyclic rotation (7 coprime to 64)
            shift = (7 * k) % dim
            rotated = F.concat(
                F.slice(F.col("embedding"), shift + 1, dim - shift),
                F.slice(F.col("embedding"), 1, shift),
            )
            c = c.withColumn("embedding", rotated)
        ecopies.append(c)
    eout = ecopies[0]
    for c in ecopies[1:]:
        eout = eout.unionByName(c)
    eout.repartition(32).write.mode("overwrite").parquet(f"{X10_DIR}/embeddings.parquet")

    # events + TPC-H tables: disjoint key-shifted copies (shard-
    # isomorphic scale-up); nation/region stay fixed -> per-nation
    # volume x10, which is what a 10x business looks like
    def shifted_copies(df, shift_cols: dict[str, int]):
        out = df
        for k in range(1, SCALE):
            c = df
            for col, n in shift_cols.items():
                c = c.withColumn(col, F.col(col) + F.lit(k * n))
            out = out.unionByName(c)
        return out

    def count_of(name: str) -> int:
        return spark.read.parquet(f"{SF_BASE}/{name}.parquet").count()

    n_events = count_of("events")
    events = spark.read.parquet(f"{SF_BASE}/events.parquet")
    n_users = events.agg(F.max("user_id")).first()[0] + 1
    shifted_copies(events, {"event_id": n_events, "user_id": n_users}).repartition(
        32
    ).write.mode("overwrite").parquet(f"{X10_DIR}/events.parquet")

    n_ord = count_of("orders")
    n_cust = count_of("customer")
    n_supp = count_of("supplier")
    n_part = count_of("part")
    shifts = {
        "customer": {"c_custkey": n_cust},
        "supplier": {"s_suppkey": n_supp},
        "part": {"p_partkey": n_part},
        "orders": {"o_orderkey": n_ord, "o_custkey": n_cust},
        "lineitem": {
            "l_orderkey": n_ord,
            "l_partkey": n_part,
            "l_suppkey": n_supp,
        },
    }
    for name, cols in shifts.items():
        df = spark.read.parquet(f"{SF_BASE}/{name}.parquet")
        shifted_copies(df, cols).repartition(32).write.mode("overwrite").parquet(
            f"{X10_DIR}/{name}.parquet"
        )
    for name in ("nation", "region"):
        spark.read.parquet(f"{SF_BASE}/{name}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{X10_DIR}/{name}.parquet")
    open(os.path.join(X10_DIR, "_SUCCESS_REHEARSAL"), "w").write("ok")


def time_query(fn, spark, sf_dir: str, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    import __spark_entry__ as entry_mod
    from py_data_pipeline_app_spark.session import get_spark

    spark = get_spark("scale-rehearsal")
    names = sys.argv[1:] or FAMILY
    load_before = round(os.getloadavg()[0], 2)
    build_x10(spark)
    from py_data_pipeline_app_spark.plans.queries import RETIRED_QUERIES

    # retired queries stay rehearsable: the 10x ratios are still the
    # scale evidence for the operator variants they exercise
    qs = {**RETIRED_QUERIES, **entry_mod.queries()}
    spark.read.parquet(f"{SF_BASE}/region.parquet").count()  # warmup

    results: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        t_base = time_query(fn, spark, SF_BASE)
        t_x10 = time_query(fn, spark, X10_DIR)
        ratio = round(t_x10 / t_base, 2) if t_base > 0 else None
        results[name] = {"sf0.1_sec": t_base, "x10_sec": t_x10, "ratio": ratio}
        flag = "  <-- SUPERLINEAR" if ratio and ratio > 12 else ""
        print(f"{name}: {t_base:.2f}s -> {t_x10:.2f}s (x{ratio}){flag}", flush=True)

    # Follow-up: the registered embedding_near_dup pins a fixed band
    # config (oracle-stable), whose random-collision candidates grow
    # quadratically with corpus size; lsh_config_for sizes bands from
    # the corpus instead (constant bucket occupancy). Measure both so
    # the artifact carries the adaptive datapoint, not just the fixed
    # one.
    followup = None
    if not sys.argv[1:] or "embedding_near_dup" in sys.argv[1:]:
        from py_data_pipeline_app_spark.operators.similarity import (
            hyperplane_lsh_near_dup_pairs,
        )
        from py_data_pipeline_app_spark.plans.queries import (
            _with_planted_near_dups,
        )

        def scaled(spark, sf_dir):
            emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            n = 2 * emb.count()  # planted corpus doubles the rows
            # round 13: the production default IS the auto path —
            # n_planes/bands resolve via lsh_config_for from n_rows
            return hyperplane_lsh_near_dup_pairs(
                _with_planted_near_dups(emb),
                dim=64,
                threshold=0.9,
                n_rows=n,
            )

        t_base = time_query(scaled, spark, SF_BASE)
        t_x10 = time_query(scaled, spark, X10_DIR)
        followup = {
            "what": "embedding near-dup through the PRODUCTION auto-banding "
            "default (n_planes/bands='auto' -> lsh_config_for, constant "
            "bucket occupancy) — candidates track true pairs, not N^2; the "
            "fixed registered config is eval/oracle-replay-only",
            "sf0.1_sec": t_base,
            "x10_sec": t_x10,
            "ratio": round(t_x10 / t_base, 2) if t_base > 0 else None,
        }
        print(
            f"followup lsh_config_for: {t_base:.2f}s -> {t_x10:.2f}s "
            f"(x{followup['ratio']})",
            flush=True,
        )

    # Follow-up 2: semantic_dedup's within-cluster pair cost is
    # controlled by k ∝ N (the documented knob); the registered query
    # pins k=16 for the oracle, so measure the scaled-k variant too.
    followup_sem = None
    if not sys.argv[1:] or "semantic_dedup" in sys.argv[1:]:
        from py_data_pipeline_app_spark.operators.similarity import semantic_dedup
        from py_data_pipeline_app_spark.plans.queries import (
            _with_planted_near_dups,
        )

        def scaled_sem(spark, sf_dir):
            emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            n = 2 * emb.count()  # planted corpus doubles the rows
            k = max(16, n // 275)  # hold expected cluster size ~constant
            return semantic_dedup(
                _with_planted_near_dups(emb), threshold=0.9, n_centroids=k
            )

        t_base = time_query(scaled_sem, spark, SF_BASE)
        t_x10 = time_query(scaled_sem, spark, X10_DIR)
        followup_sem = {
            "what": "semantic_dedup with n_centroids scaled ~N/275 (constant "
            "expected cluster size) instead of the oracle-pinned k=16 — "
            "within-cluster pair cost stays bounded as the corpus grows",
            "note": "assignment folds over k centroids per row, so the "
            "scaled-k variant only wins once within-cluster pair mass "
            "(quadratic in cluster size) outgrows the linear k-fold "
            "assignment - measure both before picking k at a new scale",
            "sf0.1_sec": t_base,
            "x10_sec": t_x10,
            "ratio": round(t_x10 / t_base, 2) if t_base > 0 else None,
        }
        print(
            f"followup semantic scaled-k: {t_base:.2f}s -> {t_x10:.2f}s "
            f"(x{followup_sem['ratio']})",
            flush=True,
        )

    # Follow-up 3 (round 15): the incremental VIDEO dHash fold at
    # crawl cadence — build the per-frame index from ~99% of the x10
    # video corpus (one-time cost, context only), then time ONE fold
    # of the ~1% holdout. The claim is per-batch cost ∝ |batch frames|
    # + matching index rows + the PRUNED partition directories of the
    # band table; the ratio row measures how that actually grows at
    # x10 (the image fold's x100 followup shape, on the video stack).
    followup_vid = None
    if not sys.argv[1:] or "video_dhash_canonicals" in sys.argv[1:]:
        import shutil
        import time as _time

        from pyspark.sql import functions as F

        from py_data_pipeline_app_spark.operators.media import (
            media_from_documents,
        )
        from py_data_pipeline_app_spark.operators.media_dedup_incremental import (
            incremental_video_dhash_fold,
        )

        def _vid_fold_times(sf_dir: str) -> tuple[float, float]:
            media = media_from_documents(
                spark.read.parquet(f"{sf_dir}/documents.parquet")
            ).filter(F.col("kind") == "video").select(
                "media_id", "payload", "meta"
            )
            hist = media.filter(F.col("media_id") % 97 != 0)
            batch = media.filter(F.col("media_id") % 97 == 0)
            dest = "/tmp/vid_idx_rehearsal"
            shutil.rmtree(dest, ignore_errors=True)
            t0 = _time.perf_counter()
            incremental_video_dhash_fold(
                spark, dest, hist, batch_token="hist"
            ).write.format("noop").mode("overwrite").save()
            t_build = _time.perf_counter() - t0
            t0 = _time.perf_counter()
            incremental_video_dhash_fold(
                spark, dest, batch, batch_token="b1"
            ).write.format("noop").mode("overwrite").save()
            t_fold = _time.perf_counter() - t0
            shutil.rmtree(dest, ignore_errors=True)
            return round(t_build, 3), round(t_fold, 3)

        vb_base, vf_base = _vid_fold_times(SF_BASE)
        vb_x10, vf_x10 = _vid_fold_times(X10_DIR)
        followup_vid = {
            "what": "one ~1%-of-corpus video batch folded into the "
            "persisted per-frame dHash index (round 15) vs re-running the "
            "batch video_near_dup_pairs rebuild: crawl cadence pays the "
            "small fold; *_build_sec is the one-time 99%-history seed, "
            "context only",
            "sf0.1_sec": vf_base,
            "x10_sec": vf_x10,
            "ratio": round(vf_x10 / vf_base, 2) if vf_base > 0 else None,
            "sf0.1_build_sec": vb_base,
            "x10_build_sec": vb_x10,
        }
        print(
            f"followup video incremental fold: {vf_base:.2f}s -> "
            f"{vf_x10:.2f}s (build {vb_base:.1f}s -> {vb_x10:.1f}s)",
            flush=True,
        )

    # Named-query invocations MERGE into the existing artifact (update
    # the named rows, keep everything else including followups) — a
    # full refresh is ~55 min, far too much to re-pay for one new
    # registration's ×10 datapoint.
    prior = {}
    if sys.argv[1:] and os.path.exists(OUT):
        try:
            with open(OUT) as f:
                loaded = json.load(f)
            if loaded.get("metric") == "scale_rehearsal_x10":
                prior = loaded
        except (OSError, ValueError):
            pass
    merged = dict(prior.get("queries") or {})
    merged.update(results)
    # Host-noise probe (round 14, the bench.py env contract): re-time
    # the first three rehearsed queries at base scale and report drift
    # vs their own start-of-run timings, so a noisy window is visible
    # IN the artifact instead of needing an out-of-band A/B rerun.
    ctl_names = [n for n in names if n in results][:3]
    ctl_start = sum(results[n]["sf0.1_sec"] for n in ctl_names)
    ctl_end = sum(time_query(qs[n], spark, SF_BASE) for n in ctl_names)
    env = {
        "load_before": load_before,
        "load_after": round(os.getloadavg()[0], 2),
        "ctl_queries": ctl_names,
        "ctl_delta_pct": (
            round(100.0 * (ctl_end / ctl_start - 1.0), 1) if ctl_start else None
        ),
    }
    artifact = {
        "metric": "scale_rehearsal_x10",
        "base_sf": 0.1,
        "scale_factor": SCALE,
        "env": env,
        "construction": "token-suffixed doc shards + dimension-rotated embedding shards (see tools/scale_rehearsal.py docstring)",
        "queries": merged,
        "superlinear": sorted(
            n for n, r in merged.items() if r["ratio"] and r["ratio"] > 12
        ),
    }
    if followup is None:
        followup = prior.get("followup_lsh_scaled")
    if followup_sem is None:
        followup_sem = prior.get("followup_semantic_scaled")
    if followup_vid is None:
        followup_vid = prior.get("followup_video_incremental_fold")
    if followup is not None:
        artifact["followup_lsh_scaled"] = followup
    if followup_sem is not None:
        artifact["followup_semantic_scaled"] = followup_sem
    if followup_vid is not None:
        artifact["followup_video_incremental_fold"] = followup_vid
    with open(OUT, "w") as f:
        json.dump(artifact, f, indent=2)
    print(f"\nwrote {OUT}")


if __name__ == "__main__":
    main()
