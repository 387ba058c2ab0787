"""Data-quality validation as aggregate queries (SURVEY §2.C C9–C14).

The reference's ``DataQualityValidator`` (`ML Feature Store
Pipeline.py:114-160`) makes several full pandas passes (isnull, duplicated,
per-column quantile + boolean masks). Here the whole profile runs in TWO
Spark jobs regardless of column count:

1. one combined aggregation computing row count, per-column null counts,
   distinct-row count, and per-numeric-column exact quartiles;
2. one aggregation counting IQR-band violations using pass 1's bounds.

Both scale out: they are partial→final hash aggregates with O(columns)
state, no driver-side data movement beyond the scalar results.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .config import DataQualityMetrics

#: A quality check: DataFrame → bool; raising counts as a failure, matching
#: the reference's try/except-as-violation (`:147-149`).
QualityCheck = Callable[[DataFrame], bool]

_NUMERIC_TYPES = (T.DoubleType, T.FloatType, T.LongType, T.IntegerType, T.ShortType, T.ByteType, T.DecimalType)


@dataclass
class QualityProfile:
    """Scalar outputs of the two profiling jobs."""

    row_count: int
    null_counts: dict[str, int]
    distinct_rows: int
    quartiles: dict[str, tuple[float, float]]
    outlier_counts: dict[str, int]
    numeric_non_null: dict[str, int]

    @property
    def null_percentage(self) -> float:
        """C9 `:122`: global null fraction over the full cell grid."""
        cells = self.row_count * max(len(self.null_counts), 1)
        return (sum(self.null_counts.values()) / cells) if cells else 0.0

    @property
    def duplicate_percentage(self) -> float:
        """C10 `:123`: all-but-first duplicate fraction = (N − distinct)/N."""
        return ((self.row_count - self.distinct_rows) / self.row_count) if self.row_count else 0.0

    @property
    def outlier_percentage(self) -> float:
        """C12 `:126-138`: IQR-band violations ÷ non-null numeric values."""
        total = sum(self.numeric_non_null.values())
        return sum(self.outlier_counts.values()) / max(total, 1)


def _numeric_columns(df: DataFrame) -> list[str]:
    return [f.name for f in df.schema.fields if isinstance(f.dataType, _NUMERIC_TYPES)]


def profile(
    df: DataFrame, *, approximate: bool = False, percentile_accuracy: int = 10000
) -> QualityProfile:
    """Run the two-pass quality profile.

    ``approximate=True`` is the 100 TB variant: HLL ``approx_count_distinct``
    for the duplicate check (no exact-distinct exchange of full-width rows)
    and KLL-sketch ``percentile_approx`` for quartiles (mergeable, bounded
    memory). Exact mode stays the default — it is what the oracle gate and
    the reference's pandas semantics (C10/C11) hash-match against.
    """
    cols = df.columns
    numeric = _numeric_columns(df)

    distinct = (
        F.approx_count_distinct(F.struct(*cols))
        if approximate
        else F.countDistinct(F.struct(*cols))
    )
    aggs = [F.count(F.lit(1)).alias("__n"), distinct.alias("__distinct")]
    aggs += [F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}") for c in cols]
    for c in numeric:
        # exact linear-interpolation percentile (pandas default) — C11 `:131-132`;
        # percentile_approx is the flagged large-scale variant (approximate=True).
        q_expr = (
            f"percentile_approx(`{c}`, array(0.25, 0.75), {percentile_accuracy})"
            if approximate
            else f"percentile(`{c}`, array(0.25, 0.75))"
        )
        aggs.append(F.expr(q_expr).alias(f"__q_{c}"))
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
    row = df.agg(*aggs).collect()[0].asDict()

    n = row["__n"]
    quartiles: dict[str, tuple[float, float]] = {}
    for c in numeric:
        q = row[f"__q_{c}"]
        if q is not None and q[0] is not None:
            quartiles[c] = (float(q[0]), float(q[1]))

    outlier_counts: dict[str, int] = {}
    if quartiles and n:
        preds = []
        for c, (q1, q3) in quartiles.items():
            iqr = q3 - q1
            lo, hi = q1 - 1.5 * iqr, q3 + 1.5 * iqr  # B9 `:133-134`
            preds.append(
                F.sum(((F.col(c) < lo) | (F.col(c) > hi)).cast("long")).alias(f"__out_{c}")
            )
        orow = df.agg(*preds).collect()[0].asDict()
        outlier_counts = {c: int(orow[f"__out_{c}"] or 0) for c in quartiles}

    return QualityProfile(
        row_count=int(n),
        null_counts={c: int(row[f"__null_{c}"] or 0) for c in cols},
        distinct_rows=int(row["__distinct"] or 0),
        quartiles=quartiles,
        outlier_counts=outlier_counts,
        numeric_non_null={c: int(row.get(f"__nn_{c}") or 0) for c in numeric},
    )


@dataclass
class DataQualityValidator:
    """C9–C14 validator with pluggable checks (reference `:114-160`)."""

    checks: dict[str, QualityCheck] = field(default_factory=dict)
    include_default_checks: bool = True

    def add_check(self, name: str, fn: QualityCheck) -> None:
        """Register a named check (reference J3 `:118-119`)."""
        self.checks[name] = fn

    def _default_checks(self, df: DataFrame, prof: QualityProfile) -> dict[str, bool]:
        """Reference defaults `:246-258`, computed from the profile (no extra
        jobs): non-empty, no all-null column, user_id column present."""
        return {
            "non_empty": prof.row_count > 0,
            "no_all_null_columns": not any(
                prof.row_count > 0 and cnt == prof.row_count for cnt in prof.null_counts.values()
            ),
            "has_user_id": "user_id" in df.columns,
        }

    def validate(self, df: DataFrame) -> tuple[DataQualityMetrics, QualityProfile]:
        prof = profile(df)
        results: dict[str, bool] = {}
        if self.include_default_checks:
            results.update(self._default_checks(df, prof))
        for name, fn in self.checks.items():
            try:
                results[name] = bool(fn(df))
            except Exception:
                results[name] = False  # raising counts as violation `:147-149`
        violations = sum(1 for ok in results.values() if not ok)
        score = max(
            0.0,
            1.0
            - (
                prof.null_percentage
                + prof.duplicate_percentage
                + prof.outlier_percentage
                + 0.1 * violations  # C13 `:152`
            ),
        )
        metrics = DataQualityMetrics(
            null_percentage=prof.null_percentage,
            duplicate_percentage=prof.duplicate_percentage,
            outlier_percentage=prof.outlier_percentage,
            schema_violations=violations,
            overall_score=score,
        )
        return metrics, prof
