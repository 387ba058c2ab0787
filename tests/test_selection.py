"""Corpus-selection operators: DSIR resampling, token-budget subsetting,
chunk-level dedup + reassembly (operators/selection.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ml_feature_store_pipeline_spark.operators import selection

# a tiny corpus where "ml"-flavored docs are the target look
DOCS = [
    (0, "ml model train eval ml model"),
    (1, "ml train data model eval loss"),
    (2, "cat dog bird fish cat dog"),
    (3, "dog fish cat bird bird cat"),
    (4, "ml model cat dog train fish"),
    (5, "bird bird bird bird bird bird"),
    (6, "model eval ml loss train data"),
    (7, "fish cat dog bird fish cat"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


# ---------------------------------------------------------------------------
# DSIR
# ---------------------------------------------------------------------------


def test_dsir_ratios_dense_and_weights_separate_domains(spark, docs):
    target = docs.filter(F.col("doc_id").isin(0, 1, 6))  # the ml-flavored docs
    raw = docs.filter(~F.col("doc_id").isin(0, 1, 6))
    ratios = selection.dsir_log_ratios(target, raw, "text", n_buckets=64)
    rows = ratios.collect()
    assert len(rows) == 64  # dense: every bucket present
    assert sorted(r["bucket"] for r in rows) == list(range(64))
    w = {
        r["doc_id"]: r["log_weight"]
        for r in selection.dsir_log_weights(
            raw, "doc_id", "text", ratios, n_buckets=64
        ).collect()
    }
    # the ml-ish raw doc must outweigh every pure animal doc
    assert w[4] > max(w[2], w[3], w[5], w[7])


def test_dsir_weights_match_python_recount(spark, docs):
    """Recompute one doc's log weight from first principles (same md5
    bucketing, same Laplace smoothing, decimal-exact sum)."""
    import hashlib
    from decimal import Decimal

    n_buckets, alpha = 64, 1.0

    def grams(text):
        toks = [t for t in text.split() if t]
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n_buckets

    t_ids, r_ids = {0, 1, 6}, {2, 3, 4, 5, 7}
    tc: dict[int, int] = {}
    rc: dict[int, int] = {}
    for i, text in DOCS:
        for g in grams(text):
            d = tc if i in t_ids else rc
            d[bucket(g)] = d.get(bucket(g), 0) + 1
    tt, rt = sum(tc.values()), sum(rc.values())
    lr = {
        b: round(
            math.log((tc.get(b, 0) + alpha) / (tt + alpha * n_buckets))
            - math.log((rc.get(b, 0) + alpha) / (rt + alpha * n_buckets)),
            9,
        )
        for b in range(n_buckets)
    }
    expect = float(
        sum((Decimal(str(lr[bucket(g)])) for g in grams(DOCS[4][1])), Decimal(0))
    )
    target = docs.filter(F.col("doc_id").isin(0, 1, 6))
    raw = docs.filter(~F.col("doc_id").isin(0, 1, 6))
    ratios = selection.dsir_log_ratios(target, raw, "text", n_buckets=n_buckets)
    got = (
        selection.dsir_log_weights(raw, "doc_id", "text", ratios, n_buckets=n_buckets)
        .filter(F.col("doc_id") == 4)
        .collect()[0]["log_weight"]
    )
    assert got == expect


def test_dsir_sample_deterministic_and_ranked(spark, docs):
    target = docs.filter(F.col("doc_id").isin(0, 1, 6))
    raw = docs.filter(~F.col("doc_id").isin(0, 1, 6))
    ratios = selection.dsir_log_ratios(target, raw, "text", n_buckets=64)
    a = selection.dsir_sample(raw, "doc_id", "text", ratios, k=3, n_buckets=64).collect()
    b = selection.dsir_sample(
        raw.repartition(7), "doc_id", "text", ratios, k=3, n_buckets=64
    ).collect()
    key = lambda r: r["doc_id"]  # noqa: E731
    assert [r.asDict() for r in sorted(a, key=key)] == [r.asDict() for r in sorted(b, key=key)]
    assert [r["sample_rank"] for r in sorted(a, key=lambda r: r["sample_rank"])] == [1, 2, 3]
    keys = [r["sample_key"] for r in sorted(a, key=lambda r: r["sample_rank"])]
    assert keys == sorted(keys, reverse=True)


def test_dsir_empty_doc_gets_zero_weight(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "   "), (3, "b c d")], "doc_id long, text string"
    )
    ratios = selection.dsir_log_ratios(
        docs.filter("doc_id = 1"), docs, "text", n_buckets=16
    )
    w = {
        r["doc_id"]: r
        for r in selection.dsir_log_weights(docs, "doc_id", "text", ratios, n_buckets=16).collect()
    }
    assert w[2]["log_weight"] == 0.0 and w[2]["n_grams"] == 0
    assert w[1]["n_grams"] == 5  # 3 unigrams + 2 bigrams


# ---------------------------------------------------------------------------
# token-budget selection
# ---------------------------------------------------------------------------


def _budget_reference(rows, budget):
    """(id, score, weight) → kept ids by the plain global-window rule."""
    out, cum = [], 0
    for i, s, w in sorted(rows, key=lambda r: (-r[1], r[0])):
        cum += w
        if cum <= budget:
            out.append((i, cum))
    return out


@pytest.mark.parametrize("budget", [0, 5, 17, 40, 1000])
def test_select_by_budget_equals_global_window(spark, budget):
    rows = [
        (1, 0.9, 10), (2, 0.9, 7), (3, 0.5, 3), (4, 1.0, 5),
        (5, 0.5, 3), (6, 0.1, 20), (7, 0.7, 1), (8, 0.7, 9),
    ]
    df = spark.createDataFrame(rows, "id long, score double, w long").repartition(5)
    got = sorted(
        (r["id"], r["cum_weight"])
        for r in selection.select_by_budget(
            df, "id", score_col="score", weight_col="w", budget=budget, n_bands=4
        ).collect()
    )
    assert got == sorted(_budget_reference(rows, budget))


def test_select_by_budget_single_score_band(spark):
    # hi == lo exercises the constant-band branch
    rows = [(i, 0.5, 2) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, score double, w long")
    kept = selection.select_by_budget(
        df, "id", score_col="score", weight_col="w", budget=7
    ).collect()
    assert sorted(r["id"] for r in kept) == [0, 1, 2]  # id tiebreak, 2+2+2 <= 7


def test_select_by_budget_empty_input(spark):
    df = spark.createDataFrame([], "id long, score double, w long")
    out = selection.select_by_budget(
        df, "id", score_col="score", weight_col="w", budget=10
    )
    assert out.count() == 0
    assert out.columns == ["id", "score", "w", "cum_weight"]


# ---------------------------------------------------------------------------
# chunk dedup
# ---------------------------------------------------------------------------


def test_chunk_dedup_keeps_first_occurrence_and_reassembles(spark):
    # chunk_tokens=2: doc 1 = [a b][c d], doc 2 repeats [a b] then adds [x y],
    # doc 3 repeats both of doc 1's chunks entirely
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b x y"), (3, "a b c d")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in selection.chunk_dedup(docs, "doc_id", "text", chunk_tokens=2).collect()}
    assert out[1]["clean_text"] == "a b c d"
    assert (out[1]["n_chunks"], out[1]["n_chunks_kept"]) == (2, 2)
    assert out[2]["clean_text"] == "x y"  # [a b] already seen in doc 1
    assert (out[2]["n_chunks"], out[2]["n_chunks_kept"]) == (2, 1)
    assert out[3]["clean_text"] == ""  # fully deduped, row preserved
    assert (out[3]["n_chunks"], out[3]["n_chunks_kept"]) == (2, 0)


def test_chunk_dedup_tail_chunk_and_empty_doc(spark):
    docs = spark.createDataFrame(
        [(1, "p q r"), (2, "   ")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in selection.chunk_dedup(docs, "doc_id", "text", chunk_tokens=2).collect()}
    assert out[1]["clean_text"] == "p q r"  # short tail chunk [r] survives
    assert out[1]["n_chunks"] == 2
    assert (out[2]["n_chunks"], out[2]["n_chunks_kept"], out[2]["clean_text"]) == (0, 0, "")


def test_chunk_dedup_partitioning_invariant(spark):
    rows = [(i, " ".join(f"w{(i * 7 + j) % 13}" for j in range(9))) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    key = lambda d: d["doc_id"]  # noqa: E731
    a = sorted((r.asDict() for r in selection.chunk_dedup(docs, "doc_id", "text", chunk_tokens=3).collect()), key=key)
    b = sorted(
        (r.asDict() for r in selection.chunk_dedup(docs.repartition(11), "doc_id", "text", chunk_tokens=3).collect()),
        key=key,
    )
    assert a == b


# ---------------------------------------------------------------------------
# source overlap matrix
# ---------------------------------------------------------------------------


def test_source_overlap_containment_and_diagonal(spark):
    # src A: chunks [a b], [c d]; src B repeats [a b] and adds [x y];
    # chunk size 2 — A∩B = {[a b]}; B's [a b] comes from doc 10 too
    docs = spark.createDataFrame(
        [
            (1, "a b c d", "A"),
            (10, "a b x y", "B"),
            (11, "x y x y", "B"),
        ],
        "doc_id long, text string, source string",
    )
    from ml_feature_store_pipeline_spark.operators.selection import source_overlap

    out = {
        (r["source_a"], r["source_b"]): r
        for r in source_overlap(docs, "doc_id", "text", "source", chunk_tokens=2).collect()
    }
    # A has 2 distinct chunks; B has 2 ([a b], [x y] — doc 11 adds no new)
    assert out[("A", "A")]["n_chunks_a"] == 2 and out[("A", "A")]["n_shared"] == 2
    assert out[("B", "B")]["n_chunks_a"] == 2
    assert out[("A", "B")]["n_shared"] == 1 and out[("A", "B")]["overlap_frac"] == 0.5
    assert out[("B", "A")]["n_shared"] == 1 and out[("B", "A")]["overlap_frac"] == 0.5
    # no pair row for sources sharing nothing
    assert ("A", "C") not in out


def test_source_overlap_digests_not_text(spark):
    # plan hygiene: the self-join input projects only digest + source
    docs = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2} w{i+3}", f"s{i % 2}") for i in range(20)],
        "doc_id long, text string, source string",
    )
    from ml_feature_store_pipeline_spark.operators.selection import source_overlap

    out = source_overlap(docs, "doc_id", "text", "source", chunk_tokens=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # chunk_text must not survive past the distinct into the join
    assert "chunk_text" not in plan.split("Join")[0].split("HashAggregate")[-1]
    assert out.count() >= 2


# ---------------------------------------------------------------------------
# quality calibration
# ---------------------------------------------------------------------------


def test_quality_calibrate_within_group_percentile(spark):
    from ml_feature_store_pipeline_spark.operators.text import quality_calibrate

    rows = [
        (1, "A", 0.1), (2, "A", 0.5), (3, "A", 0.9),
        (4, "B", 0.2), (5, "B", 0.2), (6, "B", 0.8),
    ]
    df = spark.createDataFrame(rows, "id long, src string, score double")
    out = {r["id"]: r for r in quality_calibrate(df, "id", "score", "src").collect()}
    assert out[1]["score_pct"] == 0.0
    assert out[2]["score_pct"] == 0.5
    assert out[3]["score_pct"] == 1.0
    # ties share a rank: both B 0.2 rows get 0.0
    assert out[4]["score_pct"] == 0.0 and out[5]["score_pct"] == 0.0
    assert out[6]["score_pct"] == 1.0


def test_dsir_xxhash64_fast_path_same_contract(spark, docs):
    # the fast path is a different (valid) featurizer: same dense-ratio
    # contract, same determinism, same domain separation — not same values
    target = docs.filter(F.col("doc_id").isin(0, 1, 6))
    raw = docs.filter(~F.col("doc_id").isin(0, 1, 6))
    ratios = selection.dsir_log_ratios(target, raw, "text", n_buckets=64, hash_fn="xxhash64")
    assert ratios.count() == 64
    w = {
        r["doc_id"]: r["log_weight"]
        for r in selection.dsir_log_weights(
            raw, "doc_id", "text", ratios, n_buckets=64, hash_fn="xxhash64"
        ).collect()
    }
    assert w[4] > max(w[2], w[3], w[5], w[7])  # ml-ish doc still wins
    a = selection.dsir_sample(raw, "doc_id", "text", ratios, k=3, n_buckets=64, hash_fn="xxhash64")
    b = selection.dsir_sample(
        raw.repartition(5), "doc_id", "text", ratios, k=3, n_buckets=64, hash_fn="xxhash64"
    )
    key = lambda r: r["doc_id"]  # noqa: E731
    assert sorted((r.asDict() for r in a.collect()), key=key) == sorted(
        (r.asDict() for r in b.collect()), key=key
    )
    with pytest.raises(ValueError):
        selection.dsir_log_ratios(target, raw, "text", hash_fn="sha1")


def test_select_by_budget_null_scores_fill_last(spark):
    """NULL scores band to -1 and fill AFTER every scored row — the SQL
    global window's default NULLS LAST under DESC (same in DuckDB)."""
    rows = [(1, 0.9, 4), (2, None, 4), (3, 0.1, 4), (4, None, 4)]
    df = spark.createDataFrame(rows, "id long, score double, w long").repartition(3)
    kept = lambda budget: sorted(
        r["id"]
        for r in selection.select_by_budget(
            df, "id", score_col="score", weight_col="w", budget=budget, n_bands=4
        ).collect()
    )
    assert kept(8) == [1, 3]          # scored rows exhaust the budget first
    assert kept(12) == [1, 2, 3]      # first NULL (id asc) fills next
    assert kept(100) == [1, 2, 3, 4]


def test_select_by_budget_all_null_scores(spark):
    # min/max return None with n > 0 — must not crash; id-asc fill order
    df = spark.createDataFrame(
        [(1, None, 3), (2, None, 3), (3, None, 3)], "id long, score double, w long"
    )
    kept = selection.select_by_budget(
        df, "id", score_col="score", weight_col="w", budget=6
    ).collect()
    assert sorted(r["id"] for r in kept) == [1, 2]
