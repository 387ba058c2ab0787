"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}. Each query is fully materialized
via the no-op sink (computes everything, collects nothing to the driver).

Two r7-verdict provisions against silent measurement corruption:

- **Contention sentinel**: a fixed calibration query (sum over
  ``spark.range(5e7)``, best-of-2) is timed before the suite and emitted
  as ``sentinel_sec`` alongside ``loadavg_start``/``loadavg_end``. The
  sentinel's cost is data-independent, so a round whose sentinel is 2×
  another round's measured the BOX, not the engine — r7's driver numbers
  were +35-46% on identical untouched queries (box contention) and cost a
  full idle re-bench to disprove. Compare sentinels before comparing
  query totals.
- **Full-line persistence**: the driver's BENCH_r{N}.json keeps only a
  2000-char tail, which destroyed r6's totals. The complete JSON line is
  therefore also written to ``BENCH_r{N:02d}_full.json`` next to this
  script (N inferred as max existing BENCH_r* round + 1).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ml_feature_store_pipeline_spark.session import get_spark

#: Headline set: one per operator family — scan-agg, quality profile,
#: star join, heavy join+topk, as-of, window, sessionize, dedup (minhash +
#: jaccard), similarity, text, windowed ingest.
HEADLINE = [
    "user_features",
    "quality_null_dup_stats",
    "tpch_q1",
    "tpch_q3_topk",
    "revenue_by_region",
    "asof_events_orders",
    "running_revenue",
    "sessionize_events",
    "minhash_candidate_pairs",
    "ngram_jaccard_pairs",
    "cosine_topk",
    "text_stats",
    "windowed_user_counts",
    "training_set_pit",
    "tpch_q18_like",
    "cosine_topk_blas",
    "chunk_documents",
    "scrub_pii_docs",
]

#: Added in round 2 (clustering + drift perf-tracked). Kept separate so the
#: round-over-round total stays comparable: "r01_subset_total" in the output
#: covers exactly the original HEADLINE set.
HEADLINE_R2 = [
    "dedup_survivors_docs",
    "psi_order_price_drift",
    "tfidf_terms_docs",
    "pit_scd2_orders_state",
    "incremental_user_value_stats",
    "kmv_distinct_orderkeys",
]

#: Added in round 3: the skew-safe bucketed variants (so the mitigation's
#: overhead vs the plain forms is measured every round) and the rewritten
#: 64-bit simhash near-pair pipeline. "r02_headline_total" covers exactly
#: HEADLINE + HEADLINE_R2 — the round-2 definition (23.81 s reference).
#: Measurement methodology (warm-up + best-of-2) is FROZEN as of round 2,
#: so round-over-round deltas are pure engine.
HEADLINE_R3 = [
    "asof_events_orders_bucketed",
    "training_set_pit_bucketed",
    "simhash_near_pairs",
]

#: Added in round 4: the skew-adaptive asof (must cost ~plain-form time on
#: this uniform-key data — that's the point of the probe) and the decode
#: path's Arrow batch pipeline. "r03_headline_total" covers exactly
#: HEADLINE + HEADLINE_R2 + HEADLINE_R3 — the round-3 definition (29.86 s
#: reference).
HEADLINE_R4 = [
    "asof_events_orders_auto",
    "multimodal_decode",
    "pack_sequences_docs",
    "corpus_curation_pipeline",
    "tpch_q9_like",
    "tpch_q21_like",
    # second wave: bloom-pruned scan, CDC merge, semantic dedup, audio
    # decode, quantile binning — one per new round-4 family
    "bloom_prune_lineitem",
    "merge_upsert_orders",
    "semantic_dedup_embeddings",
    "audio_decode_stats",
    "quantile_bin_orders",
]

#: Round 7 adds the serving-parity audit — the one operator family
#: (store lifecycle: register → serve → compare) never perf-tracked; its
#: cost is dominated by the store's own write/read jobs, which is exactly
#: what to watch. "r06_headline_total" (== the r5/r6 48-query definition)
#: keeps round-over-round comparability.
HEADLINE_R7 = [
    "serving_parity_audit",
    "table_profile_orders_approx",
    "ml_quality_filter_docs",
    "semantic_decontaminate_embeddings",
    "training_shard_stats",
    # late-r7: multi-epoch mixture (explode fan-out) and priority-ranked
    # dedup survivors (per-cluster window on top of the CC pipeline)
    "mixture_epochs_docs",
    "dedup_survivors_priority_docs",
    # label-aware embedding curation wave: quadratic self-kNN audit (the
    # one to watch — pre-normalized dot, 32-way repartitioned scan),
    # broadcast hard negatives, centroid prototypicality, and the two
    # zero-shuffle text passes (Gopher rules, vocab head)
    "knn_label_audit",
    "hard_negative_pairs",
    "prototypicality_scores",
    "gopher_filter_docs",
    "vocab_coverage_docs",
    # corpus-selection wave: DSIR importance resample (two gram passes +
    # broadcast ratio join), banded token-budget prefix sum, chunk dedup
    "dsir_select_docs",
    "budget_select_docs",
    "chunk_dedup_docs",
    # curation diagnostics: per-source percentile calibration (one window),
    # cross-source chunk-overlap matrix (digest-only self-join)
    "quality_calibrated_docs",
    "source_overlap_docs",
    # BPE pre-tokenizer accounting (zero-shuffle scan) + first-merge pair
    # counts (two explodes into one map-side-combined agg)
    "bpe_token_stats_docs",
    "bpe_pair_stats_docs",
    # the zero-sort sketch calibration path (one agg + broadcast join)
    "quality_calibrated_sketch_docs",
    # event analytics: ordered funnel (k chained min-aggs) and per-user OLS
    # trend slope (one decimal-exact aggregation pass)
    "funnel_view_click_purchase",
    "trend_slope_user_value",
    # cohort triangle (distinct-before-join) + JL sign projection (pure scan)
    "cohort_retention_weekly",
    "random_projection_embeddings",
    # MMR diverse re-rank: one broadcast scoring scan + k-1 pool-bounded
    # checkpointed greedy iterations
    "mmr_rerank_embeddings",
    # ColBERT MaxSim late interaction (broadcast query bag, combinable max)
    "maxsim_multivector_topk",
    # market-basket affinity (distinct-before-join; AQE-broadcast marginals)
    "event_type_affinity",
    # corpus health diagnostics: 8-gram duplication rate (digest-only
    # shuffle), Zipf vocabulary fit (bounded-small regression)
    "corpus_duplication_rate_docs",
    "zipf_fit_docs",
    # DAU/WAU/MAU spine (distinct key-days into a bounded range join)
    "active_users_daily",
    # RFM quintile segmentation (one percentile agg + broadcast assign —
    # no global ntile sort) and first/last-touch attribution (both touches
    # from one user-window pass)
    "rfm_segments",
    "touch_attribution_events",
    # per-key interpurchase gaps (lag window + agg on the SAME partitioning)
    "interpurchase_gaps",
    # k-anonymity governance audit (two combinable aggs, zero row egress)
    # and daily resample+ffill (keys x days spine, one key shuffle)
    "k_anonymity_events",
    "resample_ffill_user_value",
    # corpus session metrics (sessionize window + same-partitioning rollup)
    "session_stats_events",
    # native session_window batch agg (engine merge loop, one key shuffle)
    "session_window_agg_events",
    # within-session trigram mining (vocab^3-bounded top-k)
    "session_trigrams_events",
    # per-user behavioral entropy (two dimension-sized aggs)
    "user_event_entropy",
    # Benford first-digit audit (9-group count, broadcast spine)
    "benford_orders_totalprice",
    # daily OHLC bars (one (key, day) shuffle for window + agg)
    "ohlc_user_value_daily",
    # KMV audience overlap (two distinct-hash reductions, bottom-k merge)
    "kmv_user_overlap_view_purchase",
    # exact weighted median (one group shuffle: cum window + crossing pick)
    "weighted_median_price_by_flag",
    # l-diversity governance audit (two combinable aggs)
    "l_diversity_events",
    # part co-purchase market basket (co-keyed self-join on the fact side)
    "part_copurchase_lift",
    # Markov next-event matrix (one key shuffle, vocab^2 agg)
    "event_transition_matrix",
    # key-inequality scalars (count-of-counts fold)
    "key_skew_gini_events",
    # categorical-numeric dependence screen (one contingency agg)
    "event_value_mutual_info",
    # sort-free exact weighted median (3 scans, |groups|-row pins)
    "weighted_median_price_hist",
    # PQ ANN + exact re-rank (code-index scan, candidate-only rerank)
    "pq_ann_topk",
    # mergeable HLL MAU rollup vs exact (|days|x28 sketch rows shuffle)
    "active_users_hll_daily",
    # per-day exact percentile bands (one day shuffle)
    "daily_value_percentiles",
    # hour-of-day chi-square profile (24-group count)
    "hourly_seasonality_events",
    # trailing-baseline z-score + WoW anomaly flags (day-grain windows)
    "daily_anomaly_profile_events",
    # FK audit (distinct-key full-outer join, no fact egress)
    "referential_integrity_lineitem_orders",
    # Welch A/B t-test (one combinable moment aggregate)
    "welch_ttest_view_purchase",
    # time-to-convert stats (funnel mins + one rollup)
    "conversion_latency_view_purchase",
    # binned two-sample KS drift (two bins-row counts + CDF windows)
    "ks_value_drift_halves",
    # deterministic A/B assignment + SRM chi-square (zero-shuffle arm fn)
    "ab_assignment_srm_events",
    # MAD robust outlier profile (two exact-median passes + flag count)
    "mad_outliers_order_price",
    # calendar feature block (zero-shuffle projection, ISO pinned)
    "calendar_features_events",
    # per-class precision/recall/F1 (one contingency aggregate)
    "classification_report_embeddings",
    # fixed-point PageRank, 10 iterations (pinned edges, 2 joins + agg each)
    "part_pagerank_top20",
    # class-separability centroid matrix (one dim-grain shuffle)
    "label_centroid_distances",
    # graph degree inequality (count-of-counts fold over the edge list)
    "copurchase_degree_profile",
    # BPE training, 4 merges (per merge: one pair-count scan + fold apply)
    "bpe_train_merges",
    # BPE train -> encode roundtrip (4 folds chained in ONE projection)
    "bpe_encode_stats_docs",
    # rank/correlation statistics: one moment agg (Pearson), two banded
    # rank passes (Spearman), rank + tie aggs (Mann-Whitney U), and the
    # |days|-sized lag join (ACF)
    "corr_matrix_lineitem",
    "spearman_price_quantity",
    "mann_whitney_view_purchase",
    "acf_daily_value",
    # lexical + hybrid retrieval: filtered explode + broadcast stats (BM25),
    # candidate-sized fusion join (RRF)
    "bm25_topk_docs",
    "hybrid_rrf_topk",
    # supervised encodings + independence: banded rank transform, one
    # category agg (WOE/IV), one contingency agg (chi-square)
    "quantile_transform_orders",
    "woe_iv_event_type",
    "chi2_event_type_hour",
    # deterministic k-means: 4 zero-shuffle assignment scans against
    # literal centroids + 3 k×dim update shuffles
    "kmeans_embeddings",
    # degree-oriented triangle count (hub-proof wedge join)
    "triangle_stats_copurchase",
    # language-ID confusion vs ground truth (guess projection + one agg)
    "lang_confusion_docs",
    # retrieval eval: precision/recall@10 + NDCG@10, |queries|x k joins
    "ranking_metrics_label_topk",
    # reliability diagram + ECE terms (one bin aggregate)
    "calibration_curve_embeddings",
    # exact tie-aware ROC AUC (banded rank pass + 2-class agg)
    "roc_auc_embeddings",
    # cluster-balanced curation sample (kmeans scans + per-cluster top-m)
    "kmeans_balanced_sample",
    # Kaplan-Meier churn curve (per-key span agg; |durations|-sized tail)
    "survival_curve_users",
    # difference-in-differences (one 4-cell aggregate)
    "did_event_value",
    # sparse TF-IDF doc-doc top-k (inverted-index join, broadcast queries)
    "tfidf_doc_similarity_topk",
    # additive trend/weekday/residual split (|days|-sized after one agg)
    "seasonal_decompose_daily_value",
    # one-pass Poisson bootstrap CI (2B combinable partials, no copies)
    "bootstrap_mean_ci_value",
    # CUPED variance-reduced lift (per-user agg + one moment agg)
    "cuped_lift_value",
    # Mann-Kendall + Theil-Sen (|days|^2 pairwise, dimension-sized)
    "robust_trend_daily_value",
    # banded-rank robust center + concentration (one rank pass each)
    "trimmed_mean_order_price",
    "value_gini_order_price",
    # CUSUM level-shift detector (running-min identity, |days|-sized)
    "cusum_daily_value",
    # term co-occurrence PMI (distinct-before-self-join market basket)
    "term_pmi_docs",
    # Markov entropy rate (one lead window + |vocab|^2 table)
    "markov_entropy_rate_events",
    # per-day per-column completeness (one conditional-sum day aggregate)
    "completeness_by_day_events",
    # count/frequency encoding (category agg broadcast onto the scan)
    "count_encode_event_type",
]

#: Added in round 9 (the post-freeze expansion wave): character-grain
#: decontamination (strided rolling-hash windows against the broadcast
#: eval side), the temporal-split leakage audit (one RANGE window + two
#: aggregates), and the ANN re-rank eval harness (4 retrieval routes in
#: one plan — the expensive one to watch; its cost is route construction
#: + execution, all |queries|-bounded against the corpus scan).
#: "r08_headline_total" covers exactly HEADLINE + R2 + R3 + R4 + R5 + R7
#: — the round-7/8 definition — for round-over-round comparability.
HEADLINE_R9 = [
    "substring_decontaminate_docs",
    "temporal_split_leakage_audit",
    "ann_rerank_eval",
    # batch 2: link prediction / CF (co-keyed pair self-joins), Holt
    # forecast (day-grain fold), dimension-correlation (rows·d²/2
    # integer-lattice products — the CPU-bound one to watch),
    # readability (zero-shuffle regex floor), t-closeness (two
    # combinable aggregates)
    "adamic_adar_parts_topk",
    "item_item_cosine_topk",
    "holt_forecast_daily_value",
    "dim_correlation_topk_embeddings",
    "readability_docs",
    "t_closeness_events",
    # batch 3: changepoint (day-grain fold), layout pruning simulator
    # (3 layouts × one scan each), PCA power iteration (shares the
    # dim-correlation corpus pass + 10 dimension-sized iterations)
    "best_split_daily_value",
    "layout_pruning_audit_orders",
    "pca_power_embeddings",
    # batch 4: RAKE (token explode + doc-keyed islands), isotonic PAV
    # (one bin aggregate + n_bins-sized minimax)
    "rake_keyphrases_docs",
    "isotonic_calibration_embeddings",
    "forecast_backtest_daily_value",
    "unigram_kl_sources_docs",
    "stl_anomaly_days_value",
]

#: Added in round 10: the KL→mixture-weights loop closer (one vocab-
#: partial KL aggregate + a metadata-scale plan collect + a pushed-down
#: md5 filter scan — the corpus never shuffles).
#: "r09_headline_total" covers exactly the full 161-query round-9
#: definition (HEADLINE + R2..R5 + R7 + R9) for round-over-round
#: comparability.
HEADLINE_R10 = [
    "kl_reweighted_mixture_docs",
]

#: Added in round 5: the schema-evolving CDC merge, the re-indexed
#: negative sampler (two-level dense index — its cost vs r4's
#: single-task window is the point), and the ANALYZE profile.
#: "r04_headline_total" covers exactly HEADLINE + R2 + R3 + R4 — the
#: round-4 definition (52.15 s reference).
HEADLINE_R5 = [
    "merge_upsert_orders_evolve",
    "negative_sample_pairs",
    "table_profile_orders",
    "lm_quality_score_docs",
    "ewma_user_spend_prior",
    "decontaminate_docs",
    "image_phash_dup_groups",
    "audio_afp_dup_groups",
    "video_vhash_dup_groups",
    "embedding_quantization_stats",
]


#: Queries slower than this after best-of-2 get a third run (r8 verdict:
#: the >3 s tail is where the demonstrated ~30% per-query noise band lives).
BEST3_THRESHOLD_SEC = 3.0


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _next_round() -> int:
    """Infer the current round as max(driver-written BENCH_r{N}.json) + 1
    — the driver records that file AFTER running this script, so the max
    on disk is the previous round. Our own BENCH_r{N}_full.json artifacts
    are EXCLUDED: counting them made a second bench run within one round
    bump itself to the next round (found when the sf0.1 line landed in
    r09_full while the committed r08_full held a smoke run).

    ``SPARK_GRAFT_ROUND`` overrides the inference entirely (r8 ADVICE:
    once the driver's BENCH_r{N}.json is committed mid-round, a same-round
    re-run would otherwise label itself N+1 — export the round number to
    pin the artifact name)."""
    explicit = os.environ.get("SPARK_GRAFT_ROUND")
    if explicit:
        n = int(explicit)
        if n < 1:
            raise ValueError("SPARK_GRAFT_ROUND must be a positive integer")
        return n
    here = os.path.dirname(os.path.abspath(__file__))
    rounds = [
        int(m.group(1))
        for f in os.listdir(here)
        if (m := re.match(r"BENCH_r(\d+)\.json$", f))
    ]
    return (max(rounds) + 1) if rounds else 1


#: Best idle fresh-boot sentinel on record (r12 canonical idle line,
#: loadavg 0.42 at suite start — supersedes the r10 0.124 reading): the
#: denominator for ``sentinel_ratio`` in the output. Update only from a
#: measured idle run, never downward from a lucky sample mid-suite.
IDLE_SENTINEL = 0.112


def _sentinel_sec(spark) -> float:
    """Fixed data-independent calibration query, best-of-2: ~0.1-0.3 s on
    an idle local[32] box; scales with box contention, not with the
    engine under test."""
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        spark.range(50_000_000).selectExpr("sum(id) AS s").collect()
        best = min(best, time.time() - t0)
    return round(best, 3)


def _time_query(run) -> float:
    """Best-of-2 wall time of ``run()``: the second run reuses compiled
    codegen and the page cache, so min() reports steady-state engine time
    instead of whichever run a noisy neighbor landed on. All runs
    materialize fully. r8 verdict item 4: a query whose best-of-2 exceeds
    ``BEST3_THRESHOLD_SEC`` gets a THIRD run — the two same-code r8 full
    runs differed up to ~30% on individual heavy queries, and one extra
    sample tightens the min estimator exactly there. min (not median)
    stays the statistic so the series remains comparable with every prior
    round's best-of-2 numbers: min-of-3 <= min-of-2 by construction,
    never a definition-change jump."""
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        run()
        best = min(best, time.time() - t0)
    if best > BEST3_THRESHOLD_SEC:
        t0 = time.time()
        run()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from ml_feature_store_pipeline_spark.harness import query_registry

    registry = query_registry()
    spark = get_spark("bench")

    # warm the JVM/codegen/parquet-reader/Python-worker paths once so
    # class-loading and interpreter fork cost doesn't land on the first
    # measured query. Warming reads a bounded slice of each measured input
    # (limit+count materializes ~one row group, not the table) — the OS page
    # cache holds the full files at every sf anyway, so this shifts only
    # constant startup cost, not IO.
    spark.range(1000).count()
    from pyspark.sql import functions as _F

    from ml_feature_store_pipeline_spark.sources.readers import read_table
    for t in ("region", "lineitem", "orders", "events", "documents", "embeddings", "customer"):
        read_table(spark, sf_dir, t).limit(10_000).count()
    # one tiny Arrow round-trip forks the Python worker pool ahead of the
    # mapInPandas queries (BLAS top-k) instead of inside their timing
    spark.range(32).select(_F.col("id")).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    loadavg_start = [round(x, 2) for x in os.getloadavg()]
    sentinel = _sentinel_sec(spark)

    timings: dict[str, float] = {}
    for name in (
        HEADLINE + HEADLINE_R2 + HEADLINE_R3 + HEADLINE_R4
        + HEADLINE_R5 + HEADLINE_R7 + HEADLINE_R9 + HEADLINE_R10
    ):
        timings[name] = _time_query(lambda: materialize(registry[name](spark, sf_dir)))

    total = round(sum(timings.values()), 3)
    line = json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "sentinel_sec": sentinel,
                # r10 verdict item 6: publish the box-state correction with
                # the raw number. IDLE_SENTINEL is the best idle fresh-boot
                # sentinel on record (r10, commit e3999f9); sentinel_ratio
                # > ~1.1 means the BOX was loaded and value_sentinel_norm
                # (value / ratio) is the fairer cross-round comparator —
                # a first-order correction only, never a substitute for an
                # idle re-run when one is possible.
                "sentinel_ratio": round(sentinel / IDLE_SENTINEL, 3),
                "value_sentinel_norm": round(total / max(sentinel / IDLE_SENTINEL, 1.0), 3),
                "loadavg_start": loadavg_start,
                "loadavg_end": [round(x, 2) for x in os.getloadavg()],
                "queries": timings,
                "r01_subset_total": round(sum(timings[n] for n in HEADLINE), 3),
                "r02_headline_total": round(
                    sum(timings[n] for n in HEADLINE + HEADLINE_R2), 3
                ),
                "r03_headline_total": round(
                    sum(timings[n] for n in HEADLINE + HEADLINE_R2 + HEADLINE_R3), 3
                ),
                "r04_headline_total": round(
                    sum(
                        timings[n]
                        for n in HEADLINE + HEADLINE_R2 + HEADLINE_R3 + HEADLINE_R4
                    ),
                    3,
                ),
                "r06_headline_total": round(
                    sum(
                        timings[n]
                        for n in HEADLINE
                        + HEADLINE_R2
                        + HEADLINE_R3
                        + HEADLINE_R4
                        + HEADLINE_R5
                    ),
                    3,
                ),
                "r08_headline_total": round(
                    sum(
                        timings[n]
                        for n in HEADLINE
                        + HEADLINE_R2
                        + HEADLINE_R3
                        + HEADLINE_R4
                        + HEADLINE_R5
                        + HEADLINE_R7
                    ),
                    3,
                ),
                "r09_headline_total": round(
                    sum(
                        timings[n]
                        for n in HEADLINE
                        + HEADLINE_R2
                        + HEADLINE_R3
                        + HEADLINE_R4
                        + HEADLINE_R5
                        + HEADLINE_R7
                        + HEADLINE_R9
                    ),
                    3,
                ),
                "sf": sf,
            }
        )
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"BENCH_r{_next_round():02d}_full.json",
    )
    with open(full_path, "w") as f:
        f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
