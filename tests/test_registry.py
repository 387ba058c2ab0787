"""Driver-window invariants: the driver hash-verifies only the FIRST 50
``queries()`` entries, so the registry order is load-bearing — every
oracle-backed core query must land inside that window (round-1 verdict:
17 core queries sat unchecked at slots 50-66)."""

from __future__ import annotations

from ml_feature_store_pipeline_spark.harness import (
    DRIVER_WINDOW,
    oracle_registry,
    query_registry,
)

# The 17 queries the round-1 driver never checked — they must stay in-window.
CORE_UNCHECKED_R1 = [
    "tpch_q1",
    "tpch_q3_topk",
    "semi_join_customers",
    "anti_join_customers",
    "asof_events_orders",
    "asof_prev_order",
    "band_join_price_tiers",
    "running_revenue",
    "lag_lead_events",
    "sessionize_events",
    "set_ops_summary",
    "json_props_extract",
    "doc_fingerprints",
    "training_set_pit",
    "sample_events_10pct",
    "train_test_split_counts",
    "backfill_snapshots",
]


def test_window_is_exactly_the_first_50_entries():
    names = list(query_registry())
    assert len(DRIVER_WINDOW) == 50
    assert names[:50] == list(DRIVER_WINDOW)


def test_every_window_entry_has_an_oracle():
    oracles = oracle_registry()
    missing = [n for n in DRIVER_WINDOW if n not in oracles]
    assert missing == []


def test_core_round1_unchecked_queries_are_in_window():
    out = [n for n in CORE_UNCHECKED_R1 if n not in DRIVER_WINDOW]
    assert out == []


def test_every_oracle_has_a_query():
    queries = query_registry()
    orphans = [n for n in oracle_registry() if n not in queries]
    assert orphans == []


def test_registry_and_window_have_no_duplicates():
    assert len(set(DRIVER_WINDOW)) == len(DRIVER_WINDOW)
    names = list(query_registry())
    assert len(set(names)) == len(names)


def test_multimodal_decode_output_is_hashable(spark):
    """The round-1 driver crashed canonicalizing an array<float> column —
    the registry entry must emit only scalar columns."""
    from ml_feature_store_pipeline_spark.harness import query_registry

    fn = query_registry()["multimodal_decode"]
    df = fn(spark, "/root/testdata/sf0.001")
    bad = [f.name for f in df.schema.fields if f.dataType.typeName() in ("array", "map", "struct")]
    assert bad == []
