"""Driver-window invariants: the driver hash-verifies only the FIRST 50
``queries()`` entries, so the registry order is load-bearing. Round-7
rotation (VERDICT r6 item 2): the r6 window re-ran r5's verbatim, so the
window must now contain every query whose most recent driver-green row is
round 3 or older (the aging hard signal, reconstructed from
CORRECTNESS_r0{1..6}.json), plus the flagship and every query whose code
path round 7 touched (streaming-adjacent twins, the vectorized multimodal
stack, quantization Arrow registration, SemDeDup auto-tune, ewma guard,
dense_index gating, and the new serving-parity audit)."""

from __future__ import annotations

from ml_feature_store_pipeline_spark.harness import (
    DRIVER_WINDOW,
    oracle_registry,
    query_registry,
)

# Last driver-green row is round 2 (these three yielded r5-window slots to
# round-5 registrations and aged another two rounds — oldest signal first).
LAST_GREEN_LE_R2 = [
    "embedding_near_dup",
    "sample_events_10pct",
    "train_test_split_counts",
]

# Last driver-green row is round 3 (34 queries; the r4 window spent its
# slots on first-time verifications, and r5/r6 repeated one fixed window).
LAST_GREEN_R3 = [
    "minhash_signatures",
    "ivf_ann_topk",
    "repetition_stats_docs",
    "sliding_window_counts",
    "dedup_survivors_docs",
    "stratified_sample_counts",
    "key_skew_profile_events",
    "interval_join_price_buckets",
    "tfidf_terms_docs",
    "scd2_event_type_history",
    "pit_scd2_orders_state",
    "embedding_norm_stats",
    "token_histogram_docs",
    "kmv_distinct_orderkeys",
    "weighted_sample_events",
    "incremental_user_value_stats",
    "near_dup_edit_distance",
    "hist_quantile_prices",
    "cms_heavy_hitters_events",
    "cube_orders",
    "tpch_q4_like",
    "tpch_q18_like",
    "tpch_q14",
    "tpch_q7_like",
    "tpch_q15_like",
    "tpch_q19_like",
    "filter_in_list",
    "lineitem_quartiles",
    "events_per_type",
    "distinct_parts_per_flag",
    "revenue_by_region",
    "quartiles_by_priority",
    "top3_orders_per_priority",
    "distinct_users_per_type_2stage",
]

# Round-7 anchor slots (50 − 37 stale − 1 flagship = 12). Priority: the
# five r7-CHANGED previously-green queries (their old driver rows verified
# code that no longer exists), then 7 of the 17 r7-new registrations chosen
# for operator risk + family diversity. The 10 new registrations that did
# not fit all passed tools/verify_oracle.py at sf0.001/0.01/0.1 in round 7
# and rotate into the r8 window.
CHANGED_OR_NEW_IN_R7 = [
    "embedding_quantization_stats",   # registered query now runs the Arrow twin
    "semantic_dedup_embeddings",      # auto-tuned n_cells + oracle cell-count rule
    "video_vhash_dup_groups",         # batched pHash + majority fold + repartition
    "ewma_user_spend_prior",          # runtime span/half-life guard in the expression
    "negative_sample_pairs",          # dense_index checkpoint gating + lazy persist
    "serving_parity_audit",           # NEW: store-lifecycle parity audit
    "dsir_select_docs",               # NEW: DSIR decimal-exact weights + Gumbel top-k
    "budget_select_docs",             # NEW: banded prefix sum = global-window claim
    "chunk_dedup_docs",               # NEW: chunk dedup + doc reassembly
    "knn_label_audit",                # NEW: kNN label-consistency audit
    "gopher_filter_docs",             # NEW: Gopher rule filter
    "mixture_epochs_docs",            # NEW: multi-epoch data mixture
]

# r7-new registrations awaiting their first driver row in the r8 window —
# each locally 3-SF oracle-verified in round 7 (pinned here so the r8
# rotation has its queue in code, not in a doc). The queue now exceeds one
# 50-slot window: r8 should take them IN THIS ORDER (registration order,
# oldest verification first) plus its own anchors, and roll the remainder
# to r9 — the same aging discipline the r7 rotation applied.
R8_WINDOW_QUEUE = [
    "table_profile_orders_approx",
    "ml_quality_filter_docs",
    "semantic_decontaminate_embeddings",
    "training_shard_stats",
    "dedup_survivors_priority_docs",
    "hard_negative_pairs",
    "prototypicality_scores",
    "vocab_coverage_docs",
    "quality_calibrated_docs",
    "source_overlap_docs",
    "bpe_token_stats_docs",
    "bpe_pair_stats_docs",
    "quality_calibrated_sketch_docs",
    "funnel_view_click_purchase",
    "trend_slope_user_value",
    "cohort_retention_weekly",
    "random_projection_embeddings",
    "mmr_rerank_embeddings",
    "maxsim_multivector_topk",
    "event_type_affinity",
    "corpus_duplication_rate_docs",
    "zipf_fit_docs",
    "active_users_daily",
    "rfm_segments",
    "touch_attribution_events",
    "interpurchase_gaps",
    "k_anonymity_events",
    "resample_ffill_user_value",
    "session_stats_events",
    "session_window_agg_events",
    "session_trigrams_events",
    "user_event_entropy",
    "benford_orders_totalprice",
    "ohlc_user_value_daily",
    "kmv_user_overlap_view_purchase",
    "weighted_median_price_by_flag",
    "l_diversity_events",
    "part_copurchase_lift",
    "event_transition_matrix",
    "key_skew_gini_events",
    "event_value_mutual_info",
    "weighted_median_price_hist",
    "pq_ann_topk",
    "active_users_hll_daily",
    "daily_value_percentiles",
    "hourly_seasonality_events",
    "daily_anomaly_profile_events",
    "referential_integrity_lineitem_orders",
    "welch_ttest_view_purchase",
    "conversion_latency_view_purchase",
    "ks_value_drift_halves",
    "ab_assignment_srm_events",
    "mad_outliers_order_price",
    "calendar_features_events",
    "classification_report_embeddings",
    "part_pagerank_top20",
    "label_centroid_distances",
    "copurchase_degree_profile",
    "bpe_train_merges",
    "bpe_encode_stats_docs",
    # late-r7 statistics / retrieval / encodings / clustering / eval waves
    # (all passed tools/verify_oracle.py at sf0.001/0.01/0.1 this round)
    "corr_matrix_lineitem",
    "spearman_price_quantity",
    "mann_whitney_view_purchase",
    "acf_daily_value",
    "bm25_topk_docs",
    "hybrid_rrf_topk",
    "quantile_transform_orders",
    "woe_iv_event_type",
    "chi2_event_type_hour",
    "kmeans_embeddings",
    "triangle_stats_copurchase",
    "lang_confusion_docs",
    "ranking_metrics_label_topk",
    "calibration_curve_embeddings",
    "roc_auc_embeddings",
    "kmeans_balanced_sample",
    "survival_curve_users",
    "did_event_value",
    "tfidf_doc_similarity_topk",
    "seasonal_decompose_daily_value",
    "bootstrap_mean_ci_value",
    "cuped_lift_value",
    "robust_trend_daily_value",
    "trimmed_mean_order_price",
    "value_gini_order_price",
    "cusum_daily_value",
    "term_pmi_docs",
    "markov_entropy_rate_events",
    "completeness_by_day_events",
    "count_encode_event_type",
]

def test_window_is_exactly_the_first_50_entries():
    names = list(query_registry())
    assert len(DRIVER_WINDOW) == 50
    assert names[:50] == list(DRIVER_WINDOW)


def test_every_window_entry_has_an_oracle():
    oracles = oracle_registry()
    missing = [n for n in DRIVER_WINDOW if n not in oracles]
    assert missing == []


def test_round7_rotation_policy_is_in_window():
    for group in (LAST_GREEN_LE_R2, LAST_GREEN_R3, CHANGED_OR_NEW_IN_R7):
        out = [n for n in group if n not in DRIVER_WINDOW]
        assert out == []
    # oldest hard signal first: the three round-2-only greens lead
    assert list(DRIVER_WINDOW[:3]) == LAST_GREEN_LE_R2
    # the 37 stale queries fill the front of the window before the anchors
    assert set(DRIVER_WINDOW[:37]) == set(LAST_GREEN_LE_R2 + LAST_GREEN_R3)
    # the r8 queue is disjoint from the window and fully registered+oracled
    assert not set(R8_WINDOW_QUEUE) & set(DRIVER_WINDOW)
    oracles = oracle_registry()
    assert all(n in oracles for n in R8_WINDOW_QUEUE)


def test_every_oracle_has_a_query():
    queries = query_registry()
    orphans = [n for n in oracle_registry() if n not in queries]
    assert orphans == []


def test_registry_and_window_have_no_duplicates():
    assert len(set(DRIVER_WINDOW)) == len(DRIVER_WINDOW)
    names = list(query_registry())
    assert len(set(names)) == len(names)


def test_survey_section8_names_match_registry():
    """Every query name cited in SURVEY §8's queries() column must exist in
    the live registry (r2 verdict: `ml_minhash_pairs` had drifted)."""
    import re
    from pathlib import Path

    text = Path(__file__).resolve().parent.parent.joinpath("SURVEY.md").read_text()
    sec = text.split("## 8.")[1].split("\n## ")[0]
    names = set(query_registry())
    cited = []
    for line in sec.splitlines():
        cells = [c.strip() for c in line.split("|")]
        if len(cells) < 5 or cells[1] in ("family", "---"):
            continue
        for tok in re.findall(r"`([a-z0-9_]+)`", cells[4]):
            cited.append(tok)
    unknown = [t for t in cited if t not in names]
    assert cited and unknown == [], unknown


def test_survey_section8_star_markers_match_oracle_registry():
    """SURVEY §8 uses a trailing `*` to mark rows-only queries (no
    oracle_sql twin). r4 verdict item 3: the marker had drifted — queries
    kept their star after gaining bounded/hash oracles. Guard both
    directions against the live registry: a starred name must NOT have an
    oracle entry, and an oracle-less query must be starred."""
    import re
    from pathlib import Path

    from ml_feature_store_pipeline_spark.harness import oracle_registry

    text = Path(__file__).resolve().parent.parent.joinpath("SURVEY.md").read_text()
    sec = text.split("## 8.")[1].split("\n## ")[0]
    starred, cited = set(), set()
    for line in sec.splitlines():
        cells = [c.strip() for c in line.split("|")]
        if len(cells) < 5 or cells[1] in ("family", "---"):
            continue
        for m in re.finditer(r"`([a-z0-9_]+)`(\*?)", cells[4]):
            cited.add(m.group(1))
            if m.group(2):
                starred.add(m.group(1))
    oracles = set(oracle_registry())
    assert starred == (cited - oracles), (
        f"SURVEY §8 drift: starred-but-oracled {sorted(starred & oracles)}, "
        f"oracle-less-but-unstarred {sorted(cited - oracles - starred)}"
    )


def test_multimodal_decode_output_is_hashable(spark):
    """The round-1 driver crashed canonicalizing an array<float> column —
    the registry entry must emit only scalar columns."""
    from ml_feature_store_pipeline_spark.harness import query_registry

    fn = query_registry()["multimodal_decode"]
    df = fn(spark, "/root/testdata/sf0.001")
    bad = [f.name for f in df.schema.fields if f.dataType.typeName() in ("array", "map", "struct")]
    assert bad == []
