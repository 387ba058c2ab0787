"""Driver-window invariants: the driver hash-verifies only the FIRST 50
``queries()`` entries, so the registry order is load-bearing. Round-3
rotation (VERDICT r2): the window must contain every oracle-backed query
with no prior driver-green row, so that r1+r2+r3 history covers all 83
oracle-backed entries at least once."""

from __future__ import annotations

from ml_feature_store_pipeline_spark.harness import (
    DRIVER_WINDOW,
    oracle_registry,
    query_registry,
)

# Queries with NO driver-green row before round 3 (r2 verdict list + the
# entry added in r3) — the rotation exists to get these checked.
NEVER_DRIVER_VERIFIED_PRE_R3 = [
    "tfidf_terms_docs",
    "kmv_distinct_orderkeys",
    "cms_heavy_hitters_events",
    "hist_quantile_prices",
    "incremental_user_value_stats",
    "pit_scd2_orders_state",
    "scd2_event_type_history",
    "near_dup_edit_distance",
    "weighted_sample_events",
    "stratified_sample_counts",
    "interval_join_price_buckets",
    "key_skew_profile_events",
    "tpch_q7_like",
    "tpch_q15_like",
    "tpch_q19_like",
    "token_histogram_docs",
    "embedding_norm_stats",
    "quartiles_by_priority",
    "top3_orders_per_priority",
    "distinct_users_per_type_2stage",
    "simhash_near_pairs",
]

# Last driver-verified in round 1 — refreshed this round.
DRIVER_GREEN_R1_ONLY = [
    "cube_orders",
    "distinct_parts_per_flag",
    "events_per_type",
    "filter_in_list",
    "lineitem_quartiles",
    "minhash_signatures",
    "repetition_stats_docs",
    "revenue_by_region",
    "sliding_window_counts",
    "tpch_q14",
    "tpch_q18_like",
    "tpch_q4_like",
]


def test_window_is_exactly_the_first_50_entries():
    names = list(query_registry())
    assert len(DRIVER_WINDOW) == 50
    assert names[:50] == list(DRIVER_WINDOW)


def test_every_window_entry_has_an_oracle():
    oracles = oracle_registry()
    missing = [n for n in DRIVER_WINDOW if n not in oracles]
    assert missing == []


def test_all_previously_unverified_queries_are_in_window():
    out = [n for n in NEVER_DRIVER_VERIFIED_PRE_R3 if n not in DRIVER_WINDOW]
    assert out == []
    out = [n for n in DRIVER_GREEN_R1_ONLY if n not in DRIVER_WINDOW]
    assert out == []


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


def test_multimodal_decode_output_is_hashable(spark):
    """The round-1 driver crashed canonicalizing an array<float> column —
    the registry entry must emit only scalar columns."""
    from ml_feature_store_pipeline_spark.harness import query_registry

    fn = query_registry()["multimodal_decode"]
    df = fn(spark, "/root/testdata/sf0.001")
    bad = [f.name for f in df.schema.fields if f.dataType.typeName() in ("array", "map", "struct")]
    assert bad == []
