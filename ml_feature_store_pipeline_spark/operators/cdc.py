"""Change-data-capture apply: MERGE-INTO semantics as a DataFrame plan.

The reference's store mutates state row-at-a-time (``INSERT OR REPLACE`` /
``DELETE`` in the reference's `ML Feature Store Pipeline.py` — SURVEY §2 ops A4/A5/A9);
at 100 TB the equivalent is a *batch* merge: fold a change batch (upserts +
deletes, possibly several versions per key) into a keyed snapshot and write
the new snapshot. This module is that fold, shaped for scale:

- :func:`compact_changes` — collapse a change batch to one winning change
  per key (highest ``seq_col``; deterministic total tiebreak) with one
  window pass over the *batch only* — the target is never touched.
- :func:`merge_changes` — apply the compacted batch: target rows whose key
  is absent from the batch survive untouched; batch upserts replace /
  insert; batch deletes drop. Plan = one anti join + one union. With
  ``broadcast_batch=True`` (the common shape: batch ≪ target) the anti
  join is a *broadcast* anti join, so the 100 TB target never shuffles —
  the whole merge is map-side over the target scan.

Semantics notes:

- A delete for an absent key is a no-op (idempotent replay — the same CDC
  batch can be applied twice and yields the same snapshot, because winners
  are computed per batch and upserts overwrite).
- ``seq_col`` ties are broken by preferring deletes (a delete and an
  upsert carrying the same sequence number is a malformed feed; choosing
  the destructive op makes replay converge) and are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: Column carrying the change operation; values are ``upsert`` / ``delete``.
DEFAULT_OP_COL = "op"


def compact_changes(
    changes: DataFrame,
    keys: list[str],
    seq_col: str,
    *,
    op_col: str = DEFAULT_OP_COL,
) -> DataFrame:
    """One winning change per key: highest ``seq_col``; on a seq tie the
    delete wins (see module notes). One shuffle of the change batch by
    key — O(batch), independent of target size."""
    w = Window.partitionBy(*keys).orderBy(
        F.col(seq_col).desc(),
        F.when(F.col(op_col) == "delete", 0).otherwise(1).asc(),
    )
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_changes(
    target: DataFrame,
    changes: DataFrame,
    keys: list[str],
    *,
    op_col: str = DEFAULT_OP_COL,
    seq_col: str | None = None,
    broadcast_batch: bool = True,
    allow_new_columns: bool = False,
) -> DataFrame:
    """MERGE the change batch into ``target`` and return the new snapshot.

    ``changes`` must carry every ``target`` column plus ``op_col`` (and
    ``seq_col`` if the batch can hold several versions of a key). Output
    columns = target columns. ``target`` is assumed key-unique (one row
    per key — the invariant every snapshot this fold produces satisfies);
    merging into a multiset target keeps ALL copies of an untouched key
    and replaces all copies of an upserted one.

    Schema evolution (real CDC feeds add columns mid-stream): with
    ``allow_new_columns=True``, batch columns the target lacks are adopted
    into the output — existing target rows carry NULL for them (the
    parquet-style null-fill), upserts carry their batch values, and the
    new snapshot's schema is ``target ∪ batch`` in declaration order.
    Without the flag an evolving batch FAILS FAST (listing the new
    columns) rather than silently dropping feed data — the same
    fail-don't-guess stance as the malformed-op check below.

    Plan shape: anti join (target ⟂ batch keys) + union of batch upserts.
    The batch is the small side by construction — broadcasting it keeps
    the target scan shuffle-free: one pass over 100 TB, no exchange.
    Set ``broadcast_batch=False`` only when the batch itself is huge;
    then both sides shuffle by key (the classic sort-merge merge).
    """
    # fail fast on malformed ops: anything not upsert/delete would otherwise
    # act as a silent delete (its key wins the anti join but emits no row)
    changes = changes.withColumn(
        op_col,
        F.when(F.col(op_col).isin("upsert", "delete"), F.col(op_col)).otherwise(
            F.raise_error(F.concat(F.lit("unknown CDC op: "), F.col(op_col).cast("string")))
        ),
    )
    reserved = {op_col} | ({seq_col} if seq_col is not None else set())
    new_fields = [
        f for f in changes.schema.fields
        if f.name not in set(target.columns) and f.name not in reserved
    ]
    if new_fields:
        if not allow_new_columns:
            raise ValueError(
                "change batch carries columns the target lacks: "
                + ", ".join(f.name for f in new_fields)
                + " — pass allow_new_columns=True to evolve the snapshot schema"
            )
        for f in new_fields:
            target = target.withColumn(f.name, F.lit(None).cast(f.dataType))
    if seq_col is not None:
        changes = compact_changes(changes, keys, seq_col, op_col=op_col)
    winners = changes.select(*keys, op_col).distinct()
    batch_keys = F.broadcast(winners.select(*keys)) if broadcast_batch else winners.select(*keys)
    survivors = target.join(batch_keys, keys, "left_anti")
    upserts = changes.filter(F.col(op_col) == "upsert").select(*target.columns)
    return survivors.unionByName(upserts)


def merge_changes_sql(
    target_cte: str,
    changes_cte: str,
    keys: list[str],
    out_cols: list[str],
    *,
    op_col: str = DEFAULT_OP_COL,
    seq_col: str | None = None,
    with_ctes: str = "",
    new_cols: tuple[str, ...] = (),
) -> str:
    """DuckDB twin of :func:`merge_changes` (same compaction, same
    tie-break) for oracle construction. ``with_ctes`` supplies the
    ``name AS (...)`` definitions of ``target_cte`` / ``changes_cte``,
    spliced into this query's own WITH clause (SQL can't nest WITHs).
    ``new_cols`` lists ``out_cols`` entries the TARGET lacks (schema
    evolution): survivors emit NULL for them, upserts their batch value —
    mirroring ``allow_new_columns=True``."""
    key_list = ", ".join(keys)
    cols = ", ".join(out_cols)
    surv_cols = ", ".join(
        f"NULL AS {c}" if c in new_cols else c for c in out_cols
    )
    if seq_col is not None:
        compact = f"""
        SELECT * FROM (
          SELECT c.*, ROW_NUMBER() OVER (
            PARTITION BY {key_list}
            ORDER BY {seq_col} DESC, CASE WHEN {op_col} = 'delete' THEN 0 ELSE 1 END ASC
          ) AS __rn FROM {changes_cte} c
        ) WHERE __rn = 1"""
    else:
        compact = f"SELECT * FROM {changes_cte}"
    on = " AND ".join(f"t.{k} = w.{k}" for k in keys)
    lead = f"{with_ctes.rstrip().rstrip(',')}, " if with_ctes.strip() else ""
    return f"""
    WITH {lead}__winners AS ({compact})
    SELECT {surv_cols} FROM {target_cte} t
    WHERE NOT EXISTS (SELECT 1 FROM __winners w WHERE {on})
    UNION ALL
    SELECT {cols} FROM (SELECT * FROM __winners WHERE {op_col} = 'upsert') t
    """


def diff_snapshots(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    *,
    op_col: str = DEFAULT_OP_COL,
) -> DataFrame:
    """The inverse of :func:`merge_changes`: derive the change batch that
    turns ``old`` into ``new`` — upserts for keys that are new or whose
    row changed, deletes for keys that disappeared. Round-trip law
    (property-tested): ``merge_changes(old, diff_snapshots(old, new))``
    equals ``new`` exactly.

    PRECONDITION: both snapshots are key-unique (one row per ``keys``
    tuple) — the invariant :func:`merge_changes` maintains. On multiset
    snapshots the law does not hold: ``exceptAll`` emits nothing when a
    key's copy count shrinks but the key survives, so no change row is
    produced for it. The property test constrains inputs accordingly
    (``unique_by``); diff multiset data at your own risk.

    This is the "what changed between feature versions" primitive: diff
    two store versions to audit a correction, feed a downstream cache
    invalidation, or replicate a snapshot incrementally instead of
    re-shipping 100 TB.

    Plan shape: changed/added rows via ``new EXCEPT old`` (one shuffle on
    the full row hash — rows that didn't change never survive the
    anti-semantics), deletes via a key-level anti join. Output columns:
    ``new``'s columns + ``op_col``; delete rows carry the OLD row's
    values (useful for audit; ignored by apply)."""
    upserts = new.exceptAll(old).withColumn(op_col, F.lit("upsert"))
    deletes = (
        old.join(new.select(*keys).distinct(), keys, "left_anti")
        .withColumn(op_col, F.lit("delete"))
    )
    return upserts.unionByName(deletes)
