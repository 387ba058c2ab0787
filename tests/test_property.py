"""Property-based tests (hypothesis): Spark operators vs pandas ground truth
on randomized inputs — SURVEY §5's determinism/semantics strategy.

Each example round-trips through Spark, so example counts are kept small;
the generators bias toward the traps (ties, empty groups, boundary spans).
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from ml_feature_store_pipeline_spark.extractors import UserEventExtractor
from ml_feature_store_pipeline_spark.operators import joins
from ml_feature_store_pipeline_spark.versioning import content_version

BASE = dt.datetime(2024, 1, 1)

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),  # user_id — few users → collisions
        st.sampled_from(["click", "view", "purchase"]),
        st.one_of(st.just(0.0), st.floats(min_value=0.01, max_value=100.0, allow_nan=False)),
        st.integers(min_value=0, max_value=3 * 86400),  # offset seconds (tie-prone)
    ),
    min_size=1,
    max_size=30,
)


@SETTINGS
@given(rows=events_strategy)
def test_extractor_matches_pandas_reference(spark, rows):
    """The flagship aggregation reproduces the reference's pandas semantics
    (`ML Feature Store Pipeline.py:165-181`) on arbitrary inputs."""
    data = [(u, t, round(a, 4), BASE + dt.timedelta(seconds=s)) for u, t, a, s in rows]
    sdf = spark.createDataFrame(
        data, "user_id long, event_type string, amount double, timestamp timestamp"
    )
    out = {r["user_id"]: r.asDict() for r in UserEventExtractor().extract(sdf).collect()}

    pdf = pd.DataFrame(data, columns=["user_id", "event_type", "amount", "timestamp"])
    for uid, g in pdf.groupby("user_id"):
        got = out[uid]
        assert got["total_events"] == len(g)
        assert got["total_purchases"] == int((g.amount > 0).sum())
        assert got["total_amount"] == pytest.approx(g.amount.sum())
        pos = g.amount[g.amount > 0]
        assert got["avg_amount"] == pytest.approx(pos.mean() if len(pos) else 0.0)
        assert got["unique_event_types"] == g.event_type.nunique()
        expected_days = (g.timestamp.max() - g.timestamp.min()).days + 1
        assert got["days_active"] == expected_days
        assert got["purchase_rate"] == pytest.approx(int((g.amount > 0).sum()) / len(g))


asof_strategy = st.tuples(
    st.lists(  # left (probes)
        st.tuples(st.integers(1, 3), st.integers(0, 1000)), min_size=1, max_size=15
    ),
    st.lists(  # right (updates)
        st.tuples(st.integers(1, 3), st.integers(0, 1000), st.integers(0, 999)),
        min_size=0,
        max_size=15,
        unique_by=lambda r: (r[0], r[1]),  # one update per (key, ts) — merge_asof tie contract
    ),
)


@SETTINGS
@given(data=asof_strategy)
def test_asof_join_matches_merge_asof(spark, data):
    """The union+window as-of join reproduces pandas merge_asof (backward,
    inclusive) for arbitrary key/timestamp layouts including equal-ts."""
    left_rows, right_rows = data
    left = spark.createDataFrame(
        [(k, BASE + dt.timedelta(seconds=s), i) for i, (k, s) in enumerate(left_rows)],
        "key long, ts timestamp, row_id long",
    )
    right = spark.createDataFrame(
        [(k, BASE + dt.timedelta(seconds=s), float(v)) for k, s, v in right_rows],
        "key long, rts timestamp, val double",
    ) if right_rows else spark.createDataFrame([], "key long, rts timestamp, val double")

    out = joins.asof_join(
        left, right, key="key", left_ts="ts", right_ts="rts", value_cols=["val"]
    )
    got = {r["row_id"]: r["val"] for r in out.collect()}

    lp = pd.DataFrame(
        [(k, BASE + dt.timedelta(seconds=s), i) for i, (k, s) in enumerate(left_rows)],
        columns=["key", "ts", "row_id"],
    ).sort_values("ts", kind="stable")
    rp = (
        pd.DataFrame(
            [(k, BASE + dt.timedelta(seconds=s), float(v)) for k, s, v in right_rows],
            columns=["key", "ts", "val"],
        )
        .astype({"key": "int64", "ts": "datetime64[ns]", "val": "float64"})
        .sort_values("ts", kind="stable")
    )
    merged = pd.merge_asof(lp, rp, on="ts", by="key", direction="backward")
    for _, row in merged.iterrows():
        expected = None if pd.isna(row["val"]) else row["val"]
        assert got[row["row_id"]] == expected


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.floats(0, 10, allow_nan=False)),
        min_size=1,
        max_size=20,
    ),
    seed=st.integers(0, 2**16),
)
def test_content_version_permutation_invariant(spark, rows, seed):
    df = spark.createDataFrame([(a, round(b, 3)) for a, b in rows], "a long, b double")
    assert content_version(df) == content_version(df.repartition(3).orderBy(F.rand(seed)))


chunk_text_strategy = st.lists(
    st.text(alphabet="abc \t\n", min_size=0, max_size=40),
    min_size=1,
    max_size=6,
)


@SETTINGS
@given(
    texts=chunk_text_strategy,
    chunk=st.integers(min_value=2, max_value=8),
    overlap_frac=st.floats(min_value=0.0, max_value=0.9),
)
def test_chunking_reconstructs_token_stream(spark, texts, chunk, overlap_frac):
    """For ANY text and (chunk, overlap): stitching chunks (dropping each
    successor's overlap prefix) reproduces the whitespace token stream;
    every chunk is 1..chunk_tokens long; empty docs vanish."""
    from ml_feature_store_pipeline_spark.operators import text as t

    overlap = min(int(chunk * overlap_frac), chunk - 1)
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {}
    for r in t.chunk_documents(df, "doc_id", "text", chunk_tokens=chunk, overlap=overlap).collect():
        got.setdefault(r["doc_id"], {})[r["chunk_id"]] = r["chunk_text"].split()
    for i, raw in enumerate(texts):
        toks = raw.split()
        if not toks:
            assert i not in got
            continue
        chunks = [got[i][j] for j in sorted(got[i])]
        assert all(1 <= len(c) <= chunk for c in chunks)
        stitched = chunks[0] + [w for c in chunks[1:] for w in c[overlap:]]
        assert stitched == toks


@SETTINGS
@given(
    n=st.integers(min_value=1, max_value=300),
    frac=st.floats(min_value=0.0, max_value=1.0),
    salt=st.sampled_from(["", "x", "exp2"]),
)
def test_sampling_split_partition_properties(spark, n, frac, salt):
    """For ANY fraction/salt: split is a partition of the input, the sample
    equals the test side of the same-parameter split, and both are
    reproducible."""
    from ml_feature_store_pipeline_spark.operators import sampling

    ids = spark.range(n).select(F.col("id").alias("k"))
    train, test = sampling.train_test_split(ids, "k", frac, salt=salt)
    tr = {r["k"] for r in train.collect()}
    te = {r["k"] for r in test.collect()}
    assert tr | te == set(range(n)) and tr.isdisjoint(te)
    sampled = {r["k"] for r in sampling.deterministic_sample(ids, "k", frac, salt=salt).collect()}
    assert sampled == te


@SETTINGS
@given(
    counts=st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=60),
    budget=st.integers(min_value=1, max_value=200),
    groups=st.integers(min_value=1, max_value=5),
)
def test_pack_sequences_invariants_hold_for_any_input(spark, counts, budget, groups):
    """Sequence packing on arbitrary token counts: every doc exactly once,
    token totals conserved, no multi-doc pack over budget, next-fit
    determinism (pack ids don't depend on input partitioning)."""
    from ml_feature_store_pipeline_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [(i, int(c)) for i, c in enumerate(counts)], "doc_id long, nt long"
    )
    out = text_ops.pack_sequences(
        docs, "doc_id", n_tokens_col="nt", token_budget=budget, n_groups=groups
    ).collect()
    assert sorted(r["doc_id"] for r in out) == list(range(len(counts)))
    assert sum(r["n_tokens"] for r in out) == sum(counts)
    packs: dict[int, list[int]] = {}
    for r in out:
        packs.setdefault(r["pack_id"], []).append(r["n_tokens"])
    for members in packs.values():
        assert len(members) == 1 or sum(members) <= budget
    out2 = text_ops.pack_sequences(
        docs.repartition(3), "doc_id", n_tokens_col="nt",
        token_budget=budget, n_groups=groups,
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


# ---------------------------------------------------------------------------
# CDC merge (operators/cdc.py): algebraic laws on arbitrary change batches
# ---------------------------------------------------------------------------

cdc_target_strategy = st.lists(
    st.tuples(st.integers(min_value=0, max_value=9), st.integers(min_value=0, max_value=99)),
    min_size=0,
    max_size=12,
    unique_by=lambda t: t[0],  # keyed table: unique keys
)
cdc_batch_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),  # keys overlap + extend the target's
        st.integers(min_value=0, max_value=99),
        st.sampled_from(["upsert", "delete"]),
        st.integers(min_value=1, max_value=5),  # seq, collision-prone
    ),
    min_size=0,
    max_size=15,
)


@SETTINGS
@given(target=cdc_target_strategy, batch=cdc_batch_strategy)
def test_cdc_merge_matches_dict_model_and_replays(spark, target, batch):
    """merge == the obvious per-key dict fold; replay is a no-op."""
    from ml_feature_store_pipeline_spark.operators import cdc

    t = spark.createDataFrame(target or [(None, None)], "k int, v int").filter(
        F.col("k").isNotNull()
    )
    b = spark.createDataFrame(
        batch or [(None, None, None, None)], "k int, v int, op string, seq int"
    ).filter(F.col("k").isNotNull())

    out = cdc.merge_changes(t, b, ["k"], seq_col="seq")
    got = {r["k"]: r["v"] for r in out.collect()}

    # dict model: winner per key = max seq, delete beats upsert on a tie
    model = {k: v for k, v in target}
    winners: dict[int, tuple[int, int, str, int]] = {}
    for k, v, op, seq in batch:
        cur = winners.get(k)
        rank = (seq, 0 if op == "delete" else 1)
        # higher seq wins; tie -> delete (rank tuple: smaller second wins at same seq)
        if cur is None or rank[0] > cur[0] or (rank[0] == cur[0] and rank[1] < cur[1]):
            winners[k] = (seq, rank[1], op, v)
    for k, (_, _, op, v) in winners.items():
        if op == "delete":
            model.pop(k, None)
        else:
            model[k] = v
    assert got == model

    # idempotent replay
    again = cdc.merge_changes(out, b, ["k"], seq_col="seq")
    assert {r["k"]: r["v"] for r in again.collect()} == model


# ---------------------------------------------------------------------------
# bloom filter (operators/sketches.py): no false negatives, merge law
# ---------------------------------------------------------------------------


@SETTINGS
@given(
    members=st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=40),
    probes=st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=40),
)
def test_bloom_never_drops_members(spark, members, probes):
    from ml_feature_store_pipeline_spark.operators import sketches

    m = spark.createDataFrame([(x,) for x in members], "k long")
    state = sketches.bloom_state(m, "k", n_bits=1 << 10, depth=3)
    p = spark.createDataFrame([(x,) for x in set(probes) | set(members)], "k long")
    out = sketches.bloom_probe(p, state, "k", n_bits=1 << 10, depth=3).collect()
    passed = {r["k"] for r in out if r["bloom_pass"]}
    assert set(members) <= passed  # a bloom filter may lie positive, never negative


@SETTINGS
@given(
    old_rows=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 50)), max_size=10, unique_by=lambda t: t[0]
    ),
    new_rows=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 50)), max_size=12, unique_by=lambda t: t[0]
    ),
)
def test_cdc_diff_apply_roundtrip(spark, old_rows, new_rows):
    """diff/apply inverse law on KEY-UNIQUE snapshots (the invariant
    merge_changes maintains; ADVICE r4 — the law does NOT extend to
    multiset snapshots, where exceptAll hides shrinking copy counts):
    merge(old, diff(old, new)) == new."""
    from ml_feature_store_pipeline_spark.operators import cdc

    old = spark.createDataFrame(old_rows or [(None, None)], "k int, v int").filter(
        F.col("k").isNotNull()
    )
    new = spark.createDataFrame(new_rows or [(None, None)], "k int, v int").filter(
        F.col("k").isNotNull()
    )
    rebuilt = cdc.merge_changes(old, cdc.diff_snapshots(old, new, ["k"]), ["k"])
    assert sorted(map(tuple, rebuilt.collect())) == sorted(map(tuple, new.collect()))
    # an empty diff means identical snapshots
    if sorted(old_rows) == sorted(new_rows):
        assert cdc.diff_snapshots(old, new, ["k"]).count() == 0


@SETTINGS
@given(
    values=st.lists(
        st.one_of(st.none(), st.floats(min_value=-1e6, max_value=1e6, allow_nan=False)),
        min_size=1,
        max_size=40,
    ),
    n_bins=st.integers(min_value=2, max_value=6),
)
def test_quantile_bin_properties(spark, values, n_bins):
    """Conservation, range, null handling, and monotonicity of the bin
    assignment on arbitrary inputs (dups, constants, negatives, nulls)."""
    from ml_feature_store_pipeline_spark.operators import fe

    df = spark.createDataFrame([(v,) for v in values], "v double")
    out = fe.quantile_bin(df, "v", n_bins=n_bins).collect()
    assert len(out) == len(values)  # every row survives
    got = [(r["v"], r["bin"]) for r in out]
    for v, b in got:
        if v is None:
            assert b is None
        else:
            assert 0 <= b <= n_bins - 1
    nn = sorted([(v, b) for v, b in got if v is not None])
    for (v1, b1), (v2, b2) in zip(nn, nn[1:]):
        assert b1 <= b2  # bins are monotone in the value


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.floats(0, 100, allow_nan=False)),
        min_size=1,
        max_size=30,
    ),
    m=st.floats(min_value=0.1, max_value=50),
)
def test_target_encode_shrinkage_bounds(spark, rows, m):
    """Every encoding lies between the category's own mean and the global
    mean (the defining property of convex shrinkage)."""
    from ml_feature_store_pipeline_spark.operators import fe

    df = spark.createDataFrame(rows, ["cat", "y"])
    enc = {r["cat"]: r["enc"] for r in fe.target_encode(df, "cat", "y", prior_weight=m).collect()}
    gmean = sum(y for _, y in rows) / len(rows)
    by_cat: dict = {}
    for c, y in rows:
        by_cat.setdefault(c, []).append(y)
    for c, ys in by_cat.items():
        cmean = sum(ys) / len(ys)
        lo, hi = min(cmean, gmean), max(cmean, gmean)
        # 1e-3 slack: sums go through the decimal(28,4) determinism recipe,
        # so each value is quantized to 4 decimal places before averaging
        assert lo - 1e-3 <= enc[c] <= hi + 1e-3


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),                # key
            st.integers(0, 10_000),           # seconds offset
            st.floats(-100, 100, allow_nan=False, allow_infinity=False),
        ),
        min_size=1,
        max_size=24,
    ),
    split=st.integers(1, 23),
)
def test_decayed_state_merge_associative_and_matches_batch(spark, rows, split):
    """r5 streaming counters: for ANY event set and ANY batch split,
    merge(state(b1), state(b2)) finalized at a later asof equals the batch
    decayed_agg over the union, and the merge commutes."""
    import datetime as dt

    from ml_feature_store_pipeline_spark.operators import fe

    t0 = dt.datetime(2024, 1, 1)
    data = [(k, t0 + dt.timedelta(seconds=sec), v) for k, sec, v in rows]
    df = spark.createDataFrame(data, "k long, t timestamp, v double")
    hl = 3600.0
    asof = t0 + dt.timedelta(seconds=20_000)

    want = {
        r["k"]: (r["decayed_sum"], r["decayed_count"])
        for r in fe.decayed_agg(df, "k", "t", "v", half_life_seconds=hl, asof=asof).collect()
    }
    cut = min(split, len(rows))
    keys1 = {i for i in range(len(rows)) if i < cut}
    b1 = spark.createDataFrame([data[i] for i in sorted(keys1)] or [(None, None, None)], "k long, t timestamp, v double").filter(F.col("k").isNotNull())
    b2 = spark.createDataFrame([data[i] for i in range(len(rows)) if i not in keys1] or [(None, None, None)], "k long, t timestamp, v double").filter(F.col("k").isNotNull())
    s1 = fe.decayed_state(b1, "k", "t", "v", half_life_seconds=hl)
    s2 = fe.decayed_state(b2, "k", "t", "v", half_life_seconds=hl)
    for merged in (
        fe.merge_decayed_states(s1, s2, "k", half_life_seconds=hl),
        fe.merge_decayed_states(s2, s1, "k", half_life_seconds=hl),
    ):
        got = {
            r["k"]: (r["decayed_sum"], r["decayed_count"])
            for r in fe.finalize_decayed(merged, "k", half_life_seconds=hl, asof=asof).collect()
        }
        assert set(got) == set(want)
        for k in want:
            assert got[k][0] == pytest.approx(want[k][0], abs=2e-6)
            assert got[k][1] == pytest.approx(want[k][1], abs=2e-6)


@SETTINGS
@given(
    values=st.lists(
        st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
        min_size=4,
        max_size=30,
    ),
)
def test_winsorize_outputs_stay_inside_the_band(spark, values):
    """r5: winsorized values always lie inside [P_lower, P_upper] and the
    transform is monotone (order-preserving) on arbitrary inputs."""
    import numpy as np

    from ml_feature_store_pipeline_spark.operators.fe import winsorize

    df = spark.createDataFrame([(i, float(v)) for i, v in enumerate(values)], "i long, v double")
    rows = winsorize(df, ["v"], lower=0.1, upper=0.9).collect()
    lo, hi = np.percentile(values, [10, 90])
    got = {r["i"]: r["v_w"] for r in rows}
    for r in rows:
        assert round(lo, 6) - 1e-9 <= r["v_w"] <= round(hi, 6) + 1e-9
    order = sorted(range(len(values)), key=lambda i: values[i])
    clipped = [got[i] for i in order]
    assert clipped == sorted(clipped)  # monotone


@SETTINGS
@given(
    labels=st.lists(st.sampled_from("abcde"), min_size=1, max_size=40),
)
def test_index_encode_is_a_bijection_on_vocab(spark, labels):
    """r5: the frequency-ordered index is dense 0..V−1, unique per value,
    and ranks strictly by (count desc, value asc) on arbitrary inputs."""
    from ml_feature_store_pipeline_spark.operators.fe import index_encode

    df = spark.createDataFrame([(i, t) for i, t in enumerate(labels)], "i long, t string")
    vocab, _ = index_encode(df, "t")
    rows = sorted(vocab.collect(), key=lambda r: r["idx"])
    assert [r["idx"] for r in rows] == list(range(len(rows)))
    ranked = [(-r["n"], r["value"]) for r in rows]
    assert ranked == sorted(ranked)


# ---------------------------------------------------------------------------
# banded budget selection == single global window (r7)
# ---------------------------------------------------------------------------

budget_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=40),           # id (dups filtered below)
        st.floats(min_value=-5, max_value=5, allow_nan=False, width=16),
        st.integers(min_value=0, max_value=20),           # weight
    ),
    min_size=0,
    max_size=40,
)


@given(rows=budget_rows, budget=st.integers(min_value=0, max_value=120))
@SETTINGS
def test_select_by_budget_property(spark, rows, budget):
    """The banded prefix sum must equal the plain global-window rule for
    ANY scores (ties, negatives, constants) and any budget — including
    weights of 0 and duplicate scores straddling band boundaries."""
    from ml_feature_store_pipeline_spark.operators.selection import select_by_budget

    uniq = {i: (s, w) for i, s, w in rows}
    data = [(i, round(s, 6), w) for i, (s, w) in sorted(uniq.items())]
    df = spark.createDataFrame(data, "id long, score double, w long").repartition(3)
    got = sorted(
        (r["id"], r["cum_weight"])
        for r in select_by_budget(
            df, "id", score_col="score", weight_col="w", budget=budget, n_bands=8
        ).collect()
    )
    expect, cum = [], 0
    for i, s, w in sorted(data, key=lambda r: (-r[1], r[0])):
        cum += w
        if cum <= budget:
            expect.append((i, cum))
    assert got == sorted(expect)


@SETTINGS
@given(rows=events_strategy)
def test_transition_matrix_probs_sum_to_one_per_from(spark, rows):
    """Row-conditional probabilities must partition each from-token's mass
    and the counts must total |events| − |keys with ≥1 event| transitions,
    for arbitrary tie-heavy inputs."""
    from ml_feature_store_pipeline_spark.operators.windows import transition_matrix

    data = [
        (u, t, BASE + dt.timedelta(seconds=s), i)
        for i, (u, t, _a, s) in enumerate(rows)
    ]
    sdf = spark.createDataFrame(
        data, "user_id long, event_type string, ts timestamp, event_id long"
    )
    out = transition_matrix(sdf, "user_id", "ts", "event_type", tie_col="event_id").collect()
    pdf = pd.DataFrame([r.asDict() for r in out])
    n_keys = len({u for u, *_ in rows})
    assert (pdf["n"].sum() if len(pdf) else 0) == len(rows) - n_keys
    if len(pdf):
        sums = pdf.groupby("from_token")["prob"].sum()
        assert ((sums - 1.0).abs() < 1e-4).all()


@SETTINGS
@given(rows=events_strategy)
def test_categorical_entropy_bounds(spark, rows):
    """0 ≤ H ≤ ln(n_types) and norm ∈ [0, 1] for arbitrary inputs."""
    import math

    from ml_feature_store_pipeline_spark.operators.drift import categorical_entropy

    data = [(u, t) for u, t, _a, _s in rows]
    sdf = spark.createDataFrame(data, "user_id long, event_type string")
    for r in categorical_entropy(sdf, "user_id", "event_type").collect():
        assert 0.0 <= r["entropy"] <= math.log(r["n_types"]) + 1e-9
        if r["n_types"] > 1:
            assert 0.0 <= r["norm_entropy"] <= 1.0 + 1e-9
        else:
            assert r["norm_entropy"] is None


@SETTINGS
@given(rows=events_strategy)
def test_gini_matches_numpy_reference(spark, rows):
    """The run-folded Gini equals the classic sorted-rank formula computed
    in numpy on the same per-key counts; bounds hold."""
    import numpy as np

    from ml_feature_store_pipeline_spark.operators.drift import key_gini_skew

    sdf = spark.createDataFrame([(u,) for u, *_ in rows], "user_id long")
    r = key_gini_skew(sdf, ["user_id"]).collect()[0]
    counts = pd.Series([u for u, *_ in rows]).value_counts().sort_values().to_numpy()
    n, tot = len(counts), counts.sum()
    want = (2 * np.sum(np.arange(1, n + 1) * counts) - (n + 1) * tot) / (n * tot)
    assert r["gini"] == pytest.approx(float(want), abs=1e-6)
    assert 0.0 <= r["gini"] < 1.0
    if n > 1:
        assert -1e-9 <= r["hhi_norm"] <= 1.0 + 1e-9


@SETTINGS
@given(rows=events_strategy)
def test_session_stats_matches_pandas_recompute(spark, rows):
    """Bounce/duration stats equal a pandas gap-sessionization recompute
    (whole-second gaps, > threshold starts a session)."""
    from ml_feature_store_pipeline_spark.operators.windows import session_stats

    data = [(u, BASE + dt.timedelta(seconds=s)) for u, _t, _a, s in rows]
    sdf = spark.createDataFrame(data, "user_id long, ts timestamp")
    r = session_stats(sdf, "user_id", "ts", 600).collect()[0]

    pdf = pd.DataFrame(data, columns=["u", "ts"]).sort_values(["u", "ts"])
    sessions = []
    for _u, g in pdf.groupby("u"):
        t = g["ts"].astype("int64") // 10**9
        start = None
        prev = None
        for x in t:
            if prev is None or x - prev > 600:
                if start is not None:
                    sessions.append((start, prev))
                start = x
            prev = x
        sessions.append((start, prev))
    n = len(sessions)
    durs = sorted(e - s for s, e in sessions)
    assert r["n_sessions"] == n
    # bounce = single-EVENT sessions, which this (start, end)-only
    # recompute cannot distinguish from multi-event same-timestamp
    # sessions — so bound it: every bounce has duration 0
    assert r["bounce_sessions"] <= sum(1 for s_, e in sessions if e == s_)
    assert r["max_duration_s"] == max(durs)
    assert r["avg_duration_s"] == pytest.approx(sum(durs) / n, abs=1e-4)


# ---------------------------------------------------------------------------
# banded average ranks (the shared helper under Spearman / MWU / ROC AUC /
# quantile transform / trimmed mean / value Gini)
# ---------------------------------------------------------------------------

rank_values_strategy = st.lists(
    # tie-prone small domain mixed with arbitrary floats
    st.one_of(
        st.integers(min_value=0, max_value=5).map(float),
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=40,
)


@SETTINGS
@given(vals=rank_values_strategy, n_bands=st.integers(min_value=1, max_value=7))
def test_banded_avg_rank_equals_pandas_average_rank(spark, vals, n_bands):
    """For ANY values and ANY band count, banded ranks equal pandas'
    method='average' ranks — bands are a pure function of the value, so
    ties can never straddle a band and offsets compose exactly."""
    import pandas as pd

    from ml_feature_store_pipeline_spark.operators.drift import banded_avg_rank

    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = (
        banded_avg_rank(df, "v", n_bands=n_bands, rank_col="r")
        .toPandas()
        .sort_values(["v", "r"], ignore_index=True)
    )
    want = pd.Series(sorted(vals)).rank(method="average")
    assert (got["r"].to_numpy() == want.to_numpy()).all()


@SETTINGS
@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=9).map(float), min_size=1, max_size=30
    ),
    trim_pct=st.sampled_from([0.0, 0.1, 0.25, 0.4]),
)
def test_trimmed_mean_equals_sorted_slice(spark, vals, trim_pct):
    """The keep-count overlap construction equals the textbook 'sort, drop
    k each side, average the middle' definition on arbitrary tie-heavy
    inputs."""
    from ml_feature_store_pipeline_spark.operators.drift import trimmed_mean

    df = spark.createDataFrame([(v,) for v in vals], "v double")
    r = trimmed_mean(df, "v", trim_frac=trim_pct, n_bands=3).collect()[0]
    n = len(vals)
    k = int(n * trim_pct)
    middle = sorted(vals)[k : n - k]
    assert r["n"] == n and r["n_trimmed_each_side"] == k
    if middle:
        # the operator rounds to 6 dp — compare at that resolution
        assert r["trimmed_mean"] == pytest.approx(sum(middle) / len(middle), abs=1e-6)
    else:
        assert r["trimmed_mean"] is None


@given(
    st.dictionaries(
        st.sampled_from(["wiki", "web", "code", "books", "junk"]),
        st.integers(min_value=0, max_value=10**12),
        min_size=1,
        max_size=5,
    ),
    st.dictionaries(
        st.sampled_from(["wiki", "web", "code", "books", "junk"]),
        st.integers(min_value=0, max_value=10**13),
        max_size=5,
    ),
)
@settings(max_examples=200, deadline=None)
def test_epoch_mixture_plan_is_budget_exact_in_expectation(totals, targets):
    """Pure integer identity behind the multi-epoch mixture: for every
    source with tokens t > 0 and budget tgt > 0 the plan's
    (base, num, den) satisfies base·t + num == tgt with den == t and
    0 ≤ num < den — so the expected emitted tokens (base full copies +
    an extra copy for a num/den share of rows) equal the budget EXACTLY,
    for any magnitudes up to petatoken scale (no float in the path).
    Sources with no tokens or no budget must be (0, 0, 1) — dropped."""
    from ml_feature_store_pipeline_spark.operators.sampling import epoch_mixture_plan

    plan = epoch_mixture_plan(None, "src", None, targets, totals=totals)
    assert set(plan) == set(totals)
    for src, t in totals.items():
        base, num, den = plan[src]
        tgt = int(targets.get(src, 0))
        if t <= 0 or tgt <= 0:
            assert (base, num, den) == (0, 0, 1)
        else:
            assert den == t and 0 <= num < den
            assert base * t + num == tgt  # expectation == budget, exactly


@given(
    st.dictionaries(
        st.sampled_from(["a", "b", "c", "d", "e"]),
        st.integers(min_value=0, max_value=10**12),
        min_size=1,
        max_size=5,
    ),
    st.dictionaries(
        st.sampled_from(["a", "b", "c", "d", "e"]),
        st.integers(min_value=0, max_value=10**6),
        max_size=5,
    ),
    st.integers(min_value=0, max_value=10**13),
)
@settings(max_examples=200, deadline=None)
def test_proportional_targets_floor_split_invariants(totals, weights, budget):
    """proportional_targets never over-allocates (Σ targets ≤ budget —
    floor division only), gives zero to token-less or zero-weight
    sources, and is exact when one source holds all effective weight."""
    from ml_feature_store_pipeline_spark.operators.sampling import proportional_targets

    out = proportional_targets(totals, weights, budget)
    assert set(out) == set(totals)
    assert sum(out.values()) <= budget
    eff = {s for s, w in weights.items() if w > 0 and totals.get(s, 0) > 0}
    for s in totals:
        if s not in eff:
            assert out[s] == 0
    if len(eff) == 1:
        assert out[next(iter(eff))] == budget  # floor(budget·w/w)
