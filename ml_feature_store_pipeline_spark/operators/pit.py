"""Point-in-time training-set assembly — THE feature-store read pattern.

The reference serves features at "now" (``serve_features_async``, ``ML
Feature Store Pipeline.py:427-446``); training needs the leakage-free
historical variant: for each label row (entity, label_ts), the latest value
of every feature as of label_ts. This module assembles that over any number
of feature tables by chaining :func:`operators.joins.asof_join` — one
shuffle per feature table, no range explosion, all JVM-side.

Scale shape: each feature table contributes exactly one exchange on the
entity key (the union+window as-of), and the label set rides through them
pipelined. ``staleness_seconds`` nulls out values older than the label's
freshness horizon — the standard guard against serving stale features to
training."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .joins import asof_join, asof_join_auto, asof_join_bucketed


@dataclass
class FeatureView:
    """One feature table: ``df`` must carry the entity key column (same name
    as the label side), ``ts_col``, and the ``features`` columns. ``strict``
    excludes feature rows AT the label timestamp (prev-value semantics)."""

    df: DataFrame
    ts_col: str
    features: list[str] = field(default_factory=list)
    strict: bool = False


def training_set(
    labels: DataFrame,
    views: dict[str, FeatureView],
    *,
    key: str,
    label_ts: str,
    staleness_seconds: float | None = None,
    bucket_seconds: int | None = None,
    skew_adaptive: bool = False,
) -> DataFrame:
    """For each label row, attach ``{name}__{feature}`` = the feature's
    latest value as of the label's timestamp, plus ``{name}__asof_ts`` (the
    matched feature row's timestamp — the freshness audit column).

    With ``staleness_seconds``, features whose as-of timestamp is older than
    ``label_ts - staleness`` come back NULL (asof_ts stays, so the staleness
    decision is auditable).

    ``bucket_seconds`` switches every as-of to the skew-safe
    :func:`~.joins.asof_join_bucketed` form (identical results) — use it
    when one entity dominates the label or feature volume, since the plain
    window serializes each key into a single task. ``skew_adaptive=True``
    instead lets each view measure its own key skew and pick plain vs
    bucketed per view (:func:`~.joins.asof_join_auto`; ``bucket_seconds``
    then only sizes the buckets when the bucketed branch is chosen) — one
    count-by-key probe job per view, the right default when label/feature
    skew is unknown.
    """
    out = labels
    for name, view in views.items():
        ts_alias = f"{name}__asof_ts"
        feat_aliases = [f"{name}__{c}" for c in view.features]
        right = view.df.select(
            F.col(key),
            F.col(view.ts_col),
            F.col(view.ts_col).alias(ts_alias),
            *[F.col(c).alias(a) for c, a in zip(view.features, feat_aliases)],
        )
        asof_kwargs = dict(
            key=key,
            left_ts=label_ts,
            right_ts=view.ts_col,
            value_cols=[ts_alias, *feat_aliases],
            strict=view.strict,
        )
        if skew_adaptive:
            out = asof_join_auto(
                out, right, bucket_seconds=bucket_seconds or 86_400, **asof_kwargs
            )
        elif bucket_seconds is None:
            out = asof_join(out, right, **asof_kwargs)
        else:
            out = asof_join_bucketed(out, right, bucket_seconds=bucket_seconds, **asof_kwargs)
        if staleness_seconds is not None:
            fresh = (
                F.unix_timestamp(F.col(label_ts)) - F.unix_timestamp(F.col(ts_alias))
            ) <= F.lit(staleness_seconds)
            for a in feat_aliases:
                out = out.withColumn(a, F.when(fresh, F.col(a)))
    return out


def backfill(
    entities: DataFrame,
    snapshots: list,
    views: dict[str, FeatureView],
    *,
    key: str,
    staleness_seconds: float | None = None,
    bucket_seconds: int | None = None,
    skew_adaptive: bool = False,
) -> DataFrame:
    """Historical feature backfill: feature values for every entity at every
    snapshot timestamp — N daily/hourly materializations in ONE pass.

    The label set is entities × snapshots (explode of a literal timestamp
    array — |entities|·|snapshots| narrow rows, no shuffle to build), then
    one as-of join per feature view exactly like :func:`training_set`.
    Backfilling a year of daily snapshots costs the same shuffles as one
    snapshot — the win over running the "as of now" pipeline 365 times.
    """
    snap_arr = F.array(*[F.lit(s).cast("timestamp") for s in snapshots])
    labels = entities.select(
        F.col(key), F.explode(snap_arr).alias("snapshot_ts")
    )
    return training_set(
        labels,
        views,
        key=key,
        label_ts="snapshot_ts",
        staleness_seconds=staleness_seconds,
        bucket_seconds=bucket_seconds,
        skew_adaptive=skew_adaptive,
    )


def scd2_read(
    left: DataFrame,
    history: DataFrame,
    *,
    key: str,
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "left",
) -> DataFrame:
    """Point-in-time read against an SCD2 history table (the output shape of
    :func:`operators.windows.scd2_compress`): each left row picks up the
    attribute row whose ``[valid_from, valid_to)`` interval covers its
    timestamp (open ``valid_to`` = NULL means "current").

    This is the OTHER leakage-free read pattern: where :func:`training_set`
    as-of-joins the raw observation log (one window over labels ∪
    observations), ``scd2_read`` joins a pre-compressed run-length history —
    the right choice when attributes change rarely, because the join's right
    side is orders of magnitude smaller than the log.

    Scale shape: a plain equi-join on ``key`` with the interval predicate in
    the join condition (each left row matches at most ONE history row since
    intervals per key are disjoint — no range explosion), so Catalyst plans
    a hash/sort-merge join on the key and the interval check rides along as
    a join filter; one exchange per side, broadcastable when the compressed
    history is small.
    """
    h = history.select(
        F.col(key),
        F.col(valid_from),
        F.col(valid_to),
        *[
            F.col(c)
            for c in history.columns
            if c not in (key, valid_from, valid_to)
        ],
    )
    lt, lk = F.col(f"__l.{ts_col}"), F.col(f"__l.{key}")
    cond = (
        (lk == F.col(f"__h.{key}"))
        & (lt >= F.col(f"__h.{valid_from}"))
        & (F.col(f"__h.{valid_to}").isNull() | (lt < F.col(f"__h.{valid_to}")))
    )
    out = left.alias("__l").join(h.alias("__h"), cond, how)
    return out.select(
        *[F.col(f"__l.{c}") for c in left.columns],
        *[
            F.col(f"__h.{c}")
            for c in h.columns
            if c not in (key, valid_from, valid_to)
        ],
    )


def temporal_split_audit(
    events: DataFrame,
    *,
    entity_col: str,
    time_col: str,
    stratum_col: str,
    cutoff,
) -> DataFrame:
    """Temporal train/test split with the two leakage audits every
    training-data pipeline needs before trusting an offline eval
    (the split-side complement of :func:`training_set`'s PIT join):

    - **boundary + stratification profile**: per stratum, train/test row
      counts under ``time_col < cutoff`` — catches an unbalanced or
      empty-side split before a model trains on it;
    - **entity overlap** (``n_overlap_entities``): entities with rows on
      BOTH sides of the cutoff inside the stratum. A temporal split
      intentionally shares entities; an entity-level split must see 0
      here — either way the number belongs in the eval report;
    - **feature-window leakage** (``n_leaky_test_labels``,
      ``test_period_feature_share``): for each test-side label row, its
      as-of-label feature window (all the entity's STRICTLY earlier rows,
      the :func:`training_set` semantics) is split into pre- and
      post-cutoff mass. Labels whose window already contains test-period
      rows are flagged, and the mean test-period share is reported —
      as-of-label features on a temporal split silently evaluate the
      model on test-period history (fine for online serving, leakage for
      offline eval; Kaufman et al. 2012's target-leakage taxonomy).

    Strictly-earlier is microsecond-exact: the window is RANGE-framed on
    ``unix_micros`` up to -1, so same-microsecond rows exclude each other
    symmetrically — deterministic on every engine.

    Scale shape: one entity-hash exchange for the RANGE window, one
    (stratum, entity) aggregate that rides partial aggregation, then a
    |strata|-sized rollup. No self-join, no global sort; at 100 TB both
    wide stages are plain hash shuffles on high-cardinality keys.
    """
    cut = F.lit(cutoff).cast("timestamp")
    us = F.unix_micros(F.col(time_col))
    w = (
        Window.partitionBy(entity_col)
        .orderBy(us)
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    is_test = (F.col(time_col) >= cut).cast("int")
    labeled = events.select(
        F.col(stratum_col).alias("stratum"),
        F.col(entity_col).alias("__ent"),
        is_test.alias("__te"),
        F.count(F.lit(1)).over(w).alias("__feat_total"),
        F.sum(is_test).over(w).alias("__feat_test"),
    )
    share = F.when(
        (F.col("__te") == 1) & (F.col("__feat_total") > 0),
        F.col("__feat_test") / F.col("__feat_total"),
    ).otherwise(F.lit(0.0))
    per_entity = labeled.groupBy("stratum", "__ent").agg(
        F.sum(1 - F.col("__te")).alias("__n_tr"),
        F.sum("__te").alias("__n_te"),
        F.sum(
            F.when((F.col("__te") == 1) & (F.col("__feat_test") > 0), 1).otherwise(0)
        ).alias("__n_leaky"),
        F.sum(F.round(share, 9).cast("decimal(28,9)")).alias("__share_sum"),
    )
    return per_entity.groupBy("stratum").agg(
        F.sum("__n_tr").cast("long").alias("n_train"),
        F.sum("__n_te").cast("long").alias("n_test"),
        F.sum(
            F.when((F.col("__n_tr") > 0) & (F.col("__n_te") > 0), 1).otherwise(0)
        ).cast("long").alias("n_overlap_entities"),
        F.sum("__n_leaky").cast("long").alias("n_leaky_test_labels"),
        F.coalesce(
            F.sum("__share_sum").cast("double")
            / F.nullif(F.sum("__n_te"), F.lit(0)),
            F.lit(0.0),
        ).alias("test_period_feature_share"),
    )
