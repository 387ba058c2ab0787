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

from pyspark.sql import DataFrame
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
