"""Point-in-time training-set assembly: correctness + staleness nulling."""

from __future__ import annotations

import datetime as dt

import pytest

from ml_feature_store_pipeline_spark.operators.pit import FeatureView, training_set


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def frames(spark):
    labels = spark.createDataFrame(
        [
            (1, 10, ts("2024-01-10 00:00:00")),
            (2, 10, ts("2024-01-20 00:00:00")),
            (3, 20, ts("2024-01-10 00:00:00")),  # user with no features at all
        ],
        "label_id long, user_id long, ts timestamp",
    )
    feats = spark.createDataFrame(
        [
            (10, ts("2024-01-05 00:00:00"), 1.0),
            (10, ts("2024-01-10 00:00:00"), 2.0),  # exactly at label 1's ts
            (10, ts("2024-01-15 00:00:00"), 3.0),
        ],
        "user_id long, fts timestamp, score double",
    )
    return labels, feats


def test_inclusive_takes_equal_ts_row(spark, frames):
    labels, feats = frames
    out = training_set(
        labels,
        {"f": FeatureView(feats, "fts", ["score"])},
        key="user_id",
        label_ts="ts",
    ).collect()
    by_id = {r["label_id"]: r for r in out}
    assert by_id[1]["f__score"] == 2.0          # equal-ts row visible
    assert by_id[2]["f__score"] == 3.0          # latest before Jan 20
    assert by_id[3]["f__score"] is None         # no features for user 20
    assert by_id[3]["f__asof_ts"] is None


def test_strict_excludes_equal_ts_row(spark, frames):
    labels, feats = frames
    out = training_set(
        labels,
        {"f": FeatureView(feats, "fts", ["score"], strict=True)},
        key="user_id",
        label_ts="ts",
    ).collect()
    by_id = {r["label_id"]: r for r in out}
    assert by_id[1]["f__score"] == 1.0          # equal-ts row hidden → Jan 5 value


def test_staleness_nulls_values_keeps_audit_ts(spark, frames):
    labels, feats = frames
    out = training_set(
        labels,
        {"f": FeatureView(feats, "fts", ["score"])},
        key="user_id",
        label_ts="ts",
        staleness_seconds=3 * 86400.0,
    ).collect()
    by_id = {r["label_id"]: r for r in out}
    assert by_id[1]["f__score"] == 2.0                       # 0 days old → kept
    assert by_id[2]["f__score"] is None                      # 5 days old → nulled
    assert by_id[2]["f__asof_ts"] == ts("2024-01-15 00:00:00")  # audit col survives


def test_bucketed_training_set_equals_plain(spark, frames):
    labels, feats = frames
    views = {"f": FeatureView(feats, "fts", ["score"])}
    plain = training_set(labels, views, key="user_id", label_ts="ts")
    # 1-day buckets: label/feature pairs span buckets, so carry-forward is hit
    bucketed = training_set(
        labels, views, key="user_id", label_ts="ts", bucket_seconds=86_400
    )
    key = lambda r: r["label_id"]
    assert sorted(map(tuple, plain.collect()), key=lambda t: t[0]) == sorted(
        map(tuple, bucketed.collect()), key=lambda t: t[0]
    )


def test_two_views_chain_without_column_clashes(spark, frames):
    labels, feats = frames
    other = spark.createDataFrame(
        [(10, ts("2024-01-01 00:00:00"), "bronze")],
        "user_id long, fts timestamp, tier string",
    )
    out = training_set(
        labels,
        {
            "a": FeatureView(feats, "fts", ["score"]),
            "b": FeatureView(other, "fts", ["tier"]),
        },
        key="user_id",
        label_ts="ts",
    )
    assert {"a__score", "a__asof_ts", "b__tier", "b__asof_ts"} <= set(out.columns)
    by_id = {r["label_id"]: r for r in out.collect()}
    assert by_id[1]["a__score"] == 2.0
    assert by_id[1]["b__tier"] == "bronze"
    assert by_id[3]["b__tier"] is None


# ---------------------------------------------------------------------------
# scd2_compress + scd2_read (interval-based PIT)
# ---------------------------------------------------------------------------


@pytest.fixture()
def changelog(spark):
    # user 1: A (t1), A (t2, dup -> compresses away), B (t3), NULL (t4 -> a
    # change INTO null must still open a run); user 2: single open run
    return spark.createDataFrame(
        [
            (1, ts("2024-01-01 00:00:00"), "A", 1),
            (1, ts("2024-01-02 00:00:00"), "A", 2),
            (1, ts("2024-01-03 00:00:00"), "B", 3),
            (1, ts("2024-01-04 00:00:00"), None, 4),
            (2, ts("2024-01-02 00:00:00"), "Z", 5),
        ],
        "user_id long, cts timestamp, state string, row_id long",
    )


def test_scd2_compress_runs_and_open_interval(spark, changelog):
    from ml_feature_store_pipeline_spark.operators.windows import scd2_compress

    h = scd2_compress(
        changelog, ["user_id"], "cts", ["state"], order_tiebreak=["row_id"]
    )
    rows = {(r["user_id"], r["state"]): r for r in h.collect()}
    assert len(rows) == 4  # dup A row compressed away
    assert rows[(1, "A")]["valid_to"] == ts("2024-01-03 00:00:00")
    assert rows[(1, "B")]["valid_to"] == ts("2024-01-04 00:00:00")
    assert rows[(1, None)]["valid_to"] is None  # change INTO null opens a run
    assert rows[(2, "Z")]["valid_to"] is None


def test_scd2_read_picks_covering_interval(spark, changelog):
    from ml_feature_store_pipeline_spark.operators.pit import scd2_read
    from ml_feature_store_pipeline_spark.operators.windows import scd2_compress

    h = scd2_compress(
        changelog, ["user_id"], "cts", ["state"], order_tiebreak=["row_id"]
    )
    probes = spark.createDataFrame(
        [
            (100, 1, ts("2023-12-31 00:00:00")),  # before history -> null
            (101, 1, ts("2024-01-01 00:00:00")),  # boundary: valid_from inclusive
            (102, 1, ts("2024-01-02 12:00:00")),  # inside compressed A run
            (103, 1, ts("2024-01-03 00:00:00")),  # boundary: valid_to exclusive
            (104, 1, ts("2024-05-01 00:00:00")),  # open (null-state) run
            (105, 2, ts("2024-06-01 00:00:00")),  # open run, other key
            (106, 3, ts("2024-06-01 00:00:00")),  # unknown key -> null
        ],
        "probe_id long, user_id long, pts timestamp",
    )
    out = scd2_read(probes, h, key="user_id", ts_col="pts")
    assert out.count() == 7  # at most ONE match per probe, left rows kept
    got = {r["probe_id"]: r["state"] for r in out.collect()}
    assert got == {100: None, 101: "A", 102: "A", 103: "B", 104: None, 105: "Z", 106: None}


def test_scd2_read_matches_asof_on_dense_log(spark, changelog):
    # on non-null attrs, reading the compressed history == as-of joining the
    # raw log (the two PIT paths agree)
    from ml_feature_store_pipeline_spark.operators.joins import asof_join
    from ml_feature_store_pipeline_spark.operators.pit import scd2_read
    from ml_feature_store_pipeline_spark.operators.windows import scd2_compress

    log = changelog.filter("state IS NOT NULL")
    h = scd2_compress(log, ["user_id"], "cts", ["state"], order_tiebreak=["row_id"])
    probes = spark.createDataFrame(
        [(i, 1, ts(f"2024-01-0{d} 12:00:00")) for i, d in enumerate((1, 2, 3, 4))]
        + [(9, 2, ts("2024-01-05 00:00:00"))],
        "probe_id long, user_id long, pts timestamp",
    )
    via_hist = {
        r["probe_id"]: r["state"]
        for r in scd2_read(probes, h, key="user_id", ts_col="pts").collect()
    }
    via_asof = {
        r["probe_id"]: r["state"]
        for r in asof_join(
            probes, log, key="user_id", left_ts="pts", right_ts="cts",
            value_cols=["state"],
        ).collect()
    }
    assert via_hist == via_asof


def test_training_set_skew_adaptive_matches_plain(spark):
    """skew_adaptive routes through asof_join_auto per view; on any input
    both branches must produce the plain form's exact rows."""
    from ml_feature_store_pipeline_spark.harness_queries import _training_set_pit

    sf = "/root/testdata/sf0.001"
    plain = _training_set_pit(spark, sf, None)
    auto = _training_set_pit(spark, sf, None, skew_adaptive=True)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, auto.collect()))


def test_temporal_split_audit_hand_computed(spark):
    """Hand-built events around a cutoff: boundary counts, straddling
    entities, leaky as-of windows, and the share arithmetic — all against
    values computed by hand."""
    import datetime as dt

    from ml_feature_store_pipeline_spark.operators.pit import temporal_split_audit

    T = dt.datetime.fromisoformat
    cutoff = "2024-01-10 00:00:00"
    rows = [
        # user 1, stratum 'a': 2 train rows, 2 test rows (straddles).
        # test label at 01-11 sees feats {01-01, 01-05} -> 0 test-period;
        # test label at 01-12 sees {01-01, 01-05, 01-11} -> 1/3 test-period.
        (1, "a", T("2024-01-01 00:00:00")),
        (1, "a", T("2024-01-05 00:00:00")),
        (1, "a", T("2024-01-11 00:00:00")),
        (1, "a", T("2024-01-12 00:00:00")),
        # user 2, stratum 'a': test-only; first label has EMPTY window
        # (share 0, not leaky), second sees 1/1 test-period (leaky).
        (2, "a", T("2024-01-13 00:00:00")),
        (2, "a", T("2024-01-14 00:00:00")),
        # user 3, stratum 'b': train-only (no test labels, no overlap).
        (3, "b", T("2024-01-02 00:00:00")),
    ]
    events = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    out = {
        r["stratum"]: r
        for r in temporal_split_audit(
            events,
            entity_col="user_id",
            time_col="ts",
            stratum_col="event_type",
            cutoff=cutoff,
        ).collect()
    }
    a, b = out["a"], out["b"]
    assert (a["n_train"], a["n_test"]) == (2, 4)
    assert a["n_overlap_entities"] == 1  # only user 1 straddles
    # leaky test labels: user1@01-12 (window has 01-11) + user2@01-14
    assert a["n_leaky_test_labels"] == 2
    # shares: user1 -> 0 + 1/3; user2 -> 0 (empty window) + 1; mean over 4
    expected = (0.0 + 1.0 / 3.0 + 0.0 + 1.0) / 4.0
    assert abs(a["test_period_feature_share"] - expected) < 1e-8
    assert (b["n_train"], b["n_test"], b["n_overlap_entities"]) == (1, 0, 0)
    assert b["n_leaky_test_labels"] == 0 and b["test_period_feature_share"] == 0.0


def test_temporal_split_audit_same_microsecond_ties_exclude_each_other(spark):
    """The feature window is RANGE-framed on unix_micros up to -1: two
    events of one user in the SAME microsecond must not see each other
    (symmetric exclusion — no arbitrary row order can leak in)."""
    import datetime as dt

    from ml_feature_store_pipeline_spark.operators.pit import temporal_split_audit

    t = dt.datetime.fromisoformat("2024-01-12 00:00:00.000001")
    events = spark.createDataFrame(
        [(1, "x", t), (1, "x", t)], "user_id long, event_type string, ts timestamp"
    )
    row = temporal_split_audit(
        events,
        entity_col="user_id",
        time_col="ts",
        stratum_col="event_type",
        cutoff="2024-01-10 00:00:00",
    ).collect()[0]
    # both are test labels with EMPTY feature windows: nothing leaky
    assert row["n_test"] == 2
    assert row["n_leaky_test_labels"] == 0
    assert row["test_period_feature_share"] == 0.0


def test_temporal_split_audit_matches_bruteforce_on_random_frame(spark):
    """Seeded random events: every output column must equal a pure-Python
    recompute of the definition (strictly-earlier-by-microsecond feature
    windows, per-stratum rollups) — catches RANGE-frame, tie, and
    share-arithmetic regressions in one sweep."""
    import datetime as dt
    import random

    from ml_feature_store_pipeline_spark.operators.pit import temporal_split_audit

    rng = random.Random(417)
    base = dt.datetime(2024, 1, 1)
    cutoff = dt.datetime(2024, 1, 15)
    rows = []
    for _ in range(300):
        u = rng.randint(1, 25)
        s = rng.choice(["a", "b", "c"])
        # second-grain ts with deliberate collisions (same user, same ts)
        t = base + dt.timedelta(seconds=rng.randint(0, 28 * 86400) // 7 * 7)
        rows.append((u, s, t))
    events = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")

    # brute force: per event, feature window = same user's strictly-earlier rows
    by_user = {}
    for u, s, t in rows:
        by_user.setdefault(u, []).append(t)
    exp = {}
    for u, s, t in rows:
        te = t >= cutoff
        hist = [x for x in by_user[u] if x < t]
        ft, fte = len(hist), sum(1 for x in hist if x >= cutoff)
        st = exp.setdefault(s, {"n_train": 0, "n_test": 0, "users": {}, "leaky": 0, "share": 0.0})
        uu = st["users"].setdefault(u, [0, 0])
        if te:
            st["n_test"] += 1
            uu[1] += 1
            if fte > 0:
                st["leaky"] += 1
            if ft > 0:
                st["share"] += round(fte / ft, 9)
        else:
            st["n_train"] += 1
            uu[0] += 1
    out = {
        r["stratum"]: r
        for r in temporal_split_audit(
            events, entity_col="user_id", time_col="ts",
            stratum_col="event_type", cutoff="2024-01-15 00:00:00",
        ).collect()
    }
    assert set(out) == set(exp)
    for s, e in exp.items():
        r = out[s]
        assert (r["n_train"], r["n_test"]) == (e["n_train"], e["n_test"])
        assert r["n_overlap_entities"] == sum(
            1 for tr, te in e["users"].values() if tr > 0 and te > 0
        )
        assert r["n_leaky_test_labels"] == e["leaky"]
        want = e["share"] / e["n_test"] if e["n_test"] else 0.0
        assert abs(r["test_period_feature_share"] - want) < 1e-9
