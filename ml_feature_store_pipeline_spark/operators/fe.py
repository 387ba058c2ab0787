"""Feature-engineering operators: quantile binning, target encoding,
hashed feature crosses.

The reference computes per-key aggregates and ratios (SURVEY §2.C) but
stops short of the encoding steps every training pipeline applies next;
these are those steps, shaped for 100 TB:

- :func:`quantile_bin` — discretize a numeric column into ``n_bins``
  equal-population bins. Two passes: ONE aggregate computes every exact
  linear-interpolation boundary (Spark ``percentile``, the pandas
  default), then a broadcast of the ≤ n_bins−1 boundary values assigns
  bins map-side — no sort, no ntile-style global window (``ntile`` would
  shuffle every row into one ordering; boundaries + broadcast touch the
  data twice but never shuffle it).
- :func:`target_encode` — smoothed per-category mean of a label
  (empirical-Bayes shrinkage toward the global mean with pseudo-count
  ``prior_weight``): one partial-aggregated groupBy over the categories,
  the global mean broadcast into the encoding expression. Join the tiny
  (category, encoding) output back to the fact side with a broadcast
  hash join.
- :func:`hashed_cross` — the hashing trick for feature crosses: bucket =
  md5-derived hash of the concatenated feature tuple mod ``dim``.
  md5-deterministic (same recipe as ``sketches.cms_bucket``), so
  train/serve agree across engines, runs, and partitionings — the
  property that makes hashed crosses safe to recompute at serving time.

Float determinism: boundary values and encodings are rounded to a fixed
number of digits *before* any comparison or output, so the DuckDB twins
(`quantile_cont`, decimal-sum recipe) reproduce results hash-exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import dsum


def quantile_bin(
    df: DataFrame,
    col: str,
    *,
    n_bins: int,
    bin_col: str = "bin",
    round_digits: int = 6,
    approximate: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Append ``bin_col`` (0 … n_bins−1): the equal-population bin of
    ``col``. Bin i covers values in (b_{i−1}, b_i]; assignment is
    ``sum(v > b_i)`` over the rounded boundaries, so rows equal to a
    boundary fall in the lower bin (pandas ``qcut``-compatible edges).
    Nulls get bin NULL.

    ``approximate=True`` swaps the exact interpolated percentiles for the
    mergeable KLL sketch (``percentile_approx``) — the 100 TB path: exact
    ``percentile`` buffers every partition's values at the final merge,
    while the sketch keeps O(accuracy) state end-to-end. Boundary error
    ≤ 1/accuracy quantile mass; bin populations stay balanced to the same
    tolerance. Use exact (default) where bit-parity matters (the oracle)."""
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    qs = [i / n_bins for i in range(1, n_bins)]
    # ONE array-percentile aggregate: n_bins−1 scalar percentile aggs would
    # each buffer (exact) or sketch (approx) the column independently —
    # the array form shares a single pass/state for every boundary
    q_arr = f"array({', '.join(str(q) for q in qs)})"
    p_expr = (
        f"percentile_approx(`{col}`, {q_arr}, {accuracy})"
        if approximate
        else f"percentile(`{col}`, {q_arr})"
    )
    bounds = df.agg(F.expr(p_expr).alias("__bs")).select(
        *[
            F.round(F.element_at(F.col("__bs"), i + 1), round_digits).alias(f"__b{i}")
            for i in range(len(qs))
        ]
    )
    v = F.round(F.col(col), round_digits)
    assign = sum(
        (v > F.col(f"__b{i}")).cast("int") for i in range(len(qs))
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(bin_col, F.when(F.col(col).isNotNull(), assign))
        .drop(*[f"__b{i}" for i in range(len(qs))])
    )


def quantile_bin_sql(
    table: str, col: str, *, n_bins: int, round_digits: int = 6
) -> tuple[str, str]:
    """DuckDB twin of :func:`quantile_bin`: returns ``(bounds_cte_body,
    bin_expr)`` — a one-row CTE of rounded boundaries and the assignment
    expression referencing it (alias the CTE ``qb``)."""
    qs = [i / n_bins for i in range(1, n_bins)]
    bounds = ", ".join(
        f"ROUND(quantile_cont({col}, {q}), {round_digits}) AS b{i}" for i, q in enumerate(qs)
    )
    assign = " + ".join(
        f"CAST(ROUND({col}, {round_digits}) > qb.b{i} AS INT)" for i in range(len(qs))
    )
    return f"SELECT {bounds} FROM {table}", f"CASE WHEN {col} IS NOT NULL THEN ({assign}) END"


def target_encode(
    df: DataFrame,
    cat_col: str,
    label_col: str,
    *,
    prior_weight: float = 10.0,
    round_digits: int = 9,
) -> DataFrame:
    """Smoothed target encoding per category: one row ``(cat, n, enc)``
    with ``enc = (sum_cat + m·global_mean) / (n_cat + m)`` — the
    empirical-Bayes shrinkage that keeps rare categories near the global
    mean. Sums use the deterministic decimal recipe, the division order
    is fixed, and the output is rounded — hash-identical across engines.

    Scale shape: one partial-aggregated groupBy (category cardinality
    rows out), global mean from the SAME aggregate re-aggregated (no
    second scan); broadcast the result back onto facts for encoding."""
    cats = df.groupBy(cat_col).agg(
        F.count(label_col).alias("n"),
        dsum(F.col(label_col)).alias("__s"),
    )
    # per-category sums are 4-dp-exact doubles; re-cast to decimal for the
    # cross-category total so it stays order-insensitive too
    tot = cats.agg(
        F.sum("n").alias("__tn"),
        F.sum(F.col("__s").cast("decimal(28,4)")).cast("double").alias("__ts"),
    )
    m = F.lit(float(prior_weight))
    gmean = F.col("__ts") / F.col("__tn")
    return (
        cats.crossJoin(F.broadcast(tot))
        .withColumn(
            "enc", F.round((F.col("__s") + m * gmean) / (F.col("n") + m), round_digits)
        )
        .select(cat_col, "n", "enc")
    )


def target_encode_sql(
    table: str, cat_col: str, label_col: str, *, prior_weight: float = 10.0, round_digits: int = 9
) -> str:
    """DuckDB twin of :func:`target_encode` (same decimal sums, same
    operation order, same rounding)."""
    from ..functions import dsum_sql

    s = dsum_sql(label_col)
    return f"""
    WITH cats AS (
      SELECT {cat_col}, COUNT({label_col}) AS n, {s} AS s
      FROM {table} GROUP BY {cat_col}
    ),
    tot AS (SELECT SUM(n) AS tn,
                   CAST(SUM(CAST(s AS DECIMAL(28,4))) AS DOUBLE) AS ts FROM cats)
    SELECT {cat_col}, CAST(n AS BIGINT) AS n,
           ROUND((s + {float(prior_weight)} * (ts / tn)) / (n + {float(prior_weight)}),
                 {round_digits}) AS enc
    FROM cats, tot
    """


def hashed_cross(cols: list[Column], *, dim: int, seed: int = 0) -> Column:
    """The hashing-trick bucket of a feature cross: md5 of the
    ``'|'``-joined string forms of ``cols`` (null → ``''``), first 13 hex
    digits mod ``dim`` — deterministic across engines (the
    ``sketches.cms_bucket`` recipe with the tuple as the value)."""
    joined = F.concat_ws("|", *[F.coalesce(c.cast("string"), F.lit("")) for c in cols])
    h = F.md5(F.concat_ws(":", F.lit(str(seed)), joined))
    return F.conv(F.substring(h, 1, 13), 16, 10).cast("long") % dim


def hashed_cross_sql(exprs: list[str], *, dim: int, seed: int = 0) -> str:
    """DuckDB twin of :func:`hashed_cross` (positional hex fold)."""
    joined = " || '|' || ".join(f"COALESCE(CAST({e} AS VARCHAR), '')" for e in exprs)
    return (
        "(CAST(list_sum(list_transform(range(13), i -> "
        "(strpos('0123456789abcdef', substr("
        f"md5('{seed}' || ':' || ({joined}))"
        ", i + 1, 1)) - 1) * power(16, 12 - i))) AS BIGINT)"
        f" % {dim})"
    )


def _secs(col: Column) -> Column:
    """Epoch seconds (fractional) of any timestamp/numeric column."""
    return col.cast("timestamp").cast("double")


def decayed_agg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    half_life_seconds: float,
    asof,
    round_digits: int = 6,
) -> DataFrame:
    """Exponentially time-decayed per-key aggregate AT a point in time —
    the feature-store "decayed counter" (recent activity counts more;
    weight halves every ``half_life_seconds``). Output per key:
    ``decayed_sum = Σ v·0.5^((asof−t)/hl)``, ``decayed_count = Σ
    0.5^((asof−t)/hl)``, and their ratio ``decayed_mean``. Rows after
    ``asof`` are EXCLUDED (point-in-time correct, like the as-of join).

    Scale shape: the weight is a codegen scan expression, so this is ONE
    partial-aggregated groupBy — identical cost to a plain sum. Rounded
    for engine-stable hashing (pow last-ulp drift ≪ 1e−6).
    """
    age = _secs(F.lit(asof)) - _secs(F.col(ts_col))
    w = F.pow(F.lit(0.5), age / F.lit(float(half_life_seconds)))
    eligible = df.filter(F.col(ts_col) <= F.lit(asof))
    return eligible.groupBy(key_col).agg(
        F.round(F.sum(F.col(value_col) * w), round_digits).alias("decayed_sum"),
        F.round(F.sum(w), round_digits).alias("decayed_count"),
        F.round(
            F.sum(F.col(value_col) * w) / F.sum(w), round_digits
        ).alias("decayed_mean"),
    )


#: Max key time-span, in half-lives, the rescaled-cumsum EWMA can carry in
#: doubles (2^±900 sits safely inside float64's ~±1023-exponent range with
#: headroom for value magnitude). ewma_prior raises past this — silent inf
#: is the one unacceptable outcome for a feature column.
EWMA_SPAN_HALF_LIVES = 900.0


def ewma_prior(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    half_life_seconds: float,
    tie_col: str,
    out_col: str = "ewma_prior",
    round_digits: int = 6,
) -> DataFrame:
    """Per-event leakage-free EWMA: each row sees the decayed sum of its
    key's STRICTLY PRIOR rows (by ``(ts, tie_col)`` order — the tie column
    pins which same-timestamp rows count as "before", so results are
    deterministic across engines and partitionings):

    ``ewma_i = Σ_{j<i} v_j · 0.5^((t_i − t_j)/hl)``

    Computed as ONE key-partitioned window pass via rescaling: with
    ``T = max(t) per key``, ``z_j = v_j · 0.5^((T−t_j)/hl)`` makes
    ``ewma_i = 2^((T−t_i)/hl) · cumsum_{j<i}(z_j)`` — the exponent is
    bounded by the key's time span over the half-life, so doubles hold
    whenever ``span/hl ≲ 900`` (raise ``half_life_seconds`` for longer
    histories; the naive direct form needs no such care but is O(n²)).
    The bound is ENFORCED at runtime (r5 audit item): an ``assert_true``
    folded into the scan expression raises on the first row whose
    back-span exceeds :data:`EWMA_SPAN_HALF_LIVES`, instead of silently
    rescaling through inf/0 — zero extra jobs, executor-side, and it
    cannot be pruned because it is added (as a coalesced NULL → 0.0)
    into the value expression itself.

    Scale shape: one shuffle on ``key_col`` (the same window the as-of
    join uses — SKEW CONTRACT identical: hot keys serialize; pre-bucket
    by time if that bites). First row per key gets 0.0 (no history).
    """
    from pyspark.sql.window import Window

    wk = Window.partitionBy(key_col)
    wo = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.col(tie_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t_max = F.max(_secs(F.col(ts_col))).over(wk)
    back = (t_max - _secs(F.col(ts_col))) / F.lit(float(half_life_seconds))
    # NULL ts → NULL back-span: assert_true raises on a NULL condition
    # (it does NOT propagate NULL), so a row with no timestamp must pass
    # the guard explicitly — it contributes NULL z and lands on the
    # final coalesce's 0.0, exactly the pre-guard behavior.
    guard = F.assert_true(
        F.coalesce(back <= F.lit(EWMA_SPAN_HALF_LIVES), F.lit(True)),
        F.lit(
            "ewma_prior: a key's time span exceeds "
            f"{EWMA_SPAN_HALF_LIVES:.0f} half-lives — the rescaled-cumsum "
            "form would overflow/underflow doubles. Raise half_life_seconds "
            "or split the history into bounded-span segments."
        ),
    )
    z = F.col(value_col) * F.pow(F.lit(0.5), back) + F.coalesce(
        guard.cast("double"), F.lit(0.0)
    )
    c = F.sum(z).over(wo)
    return df.withColumn(
        out_col,
        F.round(F.coalesce(F.pow(F.lit(2.0), back) * c, F.lit(0.0)), round_digits),
    )


def standard_scale(
    df: DataFrame,
    cols: list[str],
    *,
    round_digits: int = 6,
    suffix: str = "_z",
) -> DataFrame:
    """Z-score standardization of ``cols``: one combined aggregate computes
    every column's mean and sample stddev, broadcast as a 1-row frame into
    the scan-side expression — two column-pruned passes, zero shuffles of
    the data, any number of columns. Zero-variance columns scale to 0.0
    (not NULL/inf — constant features should read as "no signal").
    Rounded for engine-stable hashing."""
    stats = df.agg(
        *[F.avg(c).alias(f"__mu_{c}") for c in cols],
        *[F.stddev_samp(c).alias(f"__sd_{c}") for c in cols],
    )
    out = df.crossJoin(F.broadcast(stats))
    for c in cols:
        z = F.when(
            F.col(f"__sd_{c}") > 0,
            (F.col(c) - F.col(f"__mu_{c}")) / F.col(f"__sd_{c}"),
        ).otherwise(F.when(F.col(c).isNotNull(), F.lit(0.0)))
        out = out.withColumn(f"{c}{suffix}", F.round(z, round_digits))
    return out.drop(*[f"__mu_{c}" for c in cols], *[f"__sd_{c}" for c in cols])


def winsorize(
    df: DataFrame,
    cols: list[str],
    *,
    lower: float = 0.01,
    upper: float = 0.99,
    round_digits: int = 6,
    suffix: str = "_w",
) -> DataFrame:
    """Percentile clipping (winsorization): values below the ``lower`` /
    above the ``upper`` exact linear-interpolation percentile clamp to it.
    Same two-pass shape as :func:`quantile_bin`: ONE aggregate computes
    both cut points per column, the 1-row result broadcasts into a
    codegen ``greatest(least(...))`` on the scan. The tail-taming step
    before scaling/encoding when heavy tails would dominate a z-score."""
    aggs = []
    for c in cols:
        aggs.append(
            F.expr(f"percentile(`{c}`, array({lower}, {upper}))").alias(f"__p_{c}")
        )
    bounds = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(bounds))
    for c in cols:
        lo, hi = F.col(f"__p_{c}")[0], F.col(f"__p_{c}")[1]
        out = out.withColumn(
            f"{c}{suffix}",
            F.round(F.greatest(F.least(F.col(c), hi), lo), round_digits),
        )
    return out.drop(*[f"__p_{c}" for c in cols])


def index_encode(
    df: DataFrame,
    col: str,
    *,
    min_count: int = 1,
    oov_index: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Frequency-ordered label indexing (StringIndexer semantics, made
    deterministic): vocabulary = distinct values with ``count >=
    min_count``, indexed ``0..V−1`` by (count DESC, value ASC) — the exact
    tie rule MLlib leaves to sort instability is pinned, so train-time and
    serve-time runs agree across engines and partitionings.

    Returns ``(vocab, encoded)``: ``vocab`` is the ``(value, n, idx)``
    table (persist it next to the model — it IS the encoder); ``encoded``
    is ``df`` plus ``{col}_idx``, with out-of-vocabulary rows mapped to
    ``oov_index`` (default ``V``, the "unknown" bucket). NULL categories
    are excluded from the vocabulary and route to OOV like any unseen
    value: an equality join can never match NULL, so a NULL vocab entry
    would be dead weight that inflates V (and thus the default OOV index)
    without ever encoding a row.

    Scale shape: the vocab aggregate partial-combines to dim size; the
    index is the parallel two-level rank (:func:`..sampling.dense_index`
    on the composite (−count, value) ordering — no single-task window);
    encoding joins the broadcast vocab back map-side.
    """
    from .sampling import dense_index

    counts = (
        df.filter(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("__val"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .withColumn("__negn", -F.col("n"))
    )
    indexed = (
        dense_index(counts, ["__negn", "__val"], idx_col="__vidx")
        .drop("__negn")
        .select("__val", "n", F.col("__vidx").cast("int").alias("__vidx"))
    )
    v = indexed.count()
    oov = F.lit(int(oov_index if oov_index is not None else v))
    encoded = (
        df.join(
            F.broadcast(indexed.select("__val", "__vidx")),
            df[col] == F.col("__val"),
            "left",
        )
        .withColumn(f"{col}_idx", F.coalesce(F.col("__vidx"), oov))
        .drop("__val", "__vidx")
    )
    vocab = indexed.select(
        F.col("__val").alias("value"), "n", F.col("__vidx").alias("idx")
    )
    return vocab, encoded


def group_standard_scale(
    df: DataFrame,
    cols: list[str],
    *,
    by: str,
    round_digits: int = 6,
    suffix: str = "_gz",
    broadcast_stats: bool = True,
) -> DataFrame:
    """Per-group z-score: standardize ``cols`` within each ``by`` group
    (the within-user / within-category normalization that removes
    per-entity scale before global models see the data). One
    partial-aggregated groupBy builds the (group, mean, std) table —
    category-count-sized, broadcast back by default — so the fact side
    joins map-side and never shuffles. Set ``broadcast_stats=False`` only
    for a group cardinality too big to broadcast (then both sides shuffle
    on the key — still one exchange each). Degenerate groups (single row /
    zero variance) scale to 0.0 like :func:`standard_scale`."""
    stats = df.groupBy(by).agg(
        *[F.avg(c).alias(f"__mu_{c}") for c in cols],
        *[F.stddev_samp(c).alias(f"__sd_{c}") for c in cols],
    )
    joined = df.join(F.broadcast(stats) if broadcast_stats else stats, by)
    for c in cols:
        z = F.when(
            F.col(f"__sd_{c}") > 0,
            (F.col(c) - F.col(f"__mu_{c}")) / F.col(f"__sd_{c}"),
        ).otherwise(F.when(F.col(c).isNotNull(), F.lit(0.0)))
        joined = joined.withColumn(f"{c}{suffix}", F.round(z, round_digits))
    return joined.drop(*[f"__mu_{c}" for c in cols], *[f"__sd_{c}" for c in cols])


def decayed_state(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    half_life_seconds: float,
) -> DataFrame:
    """Mergeable per-key decayed-counter STATE: ``(key, dsum, dcnt,
    ref_ts)`` with the sums referenced to the key's latest seen timestamp
    (``dsum = Σ v·0.5^((ref_ts−t)/hl)``). The re-referenced form is what
    makes the counter INCREMENTAL: states from disjoint batches merge
    associatively and order-independently (:func:`merge_decayed_states`),
    so a streaming sink folds micro-batches without ever rescanning
    history, and :func:`finalize_decayed` evaluates the counter at any
    later as-of. One window + one aggregate, both on the same key
    partitioning (a single shuffle)."""
    from pyspark.sql.window import Window

    t = _secs(F.col(ts_col))
    ref = F.max(t).over(Window.partitionBy(key_col))
    withref = df.withColumn("__ref", ref)
    w = F.pow(F.lit(0.5), (F.col("__ref") - t) / F.lit(float(half_life_seconds)))
    return (
        withref.groupBy(F.col(key_col), F.col("__ref").alias("ref_ts"))
        .agg(
            F.sum(F.col(value_col) * w).alias("dsum"),
            F.sum(w).alias("dcnt"),
        )
    )


def merge_decayed_states(
    a: DataFrame, b: DataFrame, key_col: str, *, half_life_seconds: float
) -> DataFrame:
    """Merge two decayed-counter states (full outer on key): both sides
    re-reference to the later ``ref_ts`` and add. Associative and
    commutative (property-tested against the batch
    :func:`decayed_agg` over the unioned raw events), so batches can
    arrive in any grouping or order."""
    hl = F.lit(float(half_life_seconds))
    aa = a.select(
        F.col(key_col), F.col("ref_ts").alias("__ra"),
        F.col("dsum").alias("__sa"), F.col("dcnt").alias("__ca"),
    )
    bb = b.select(
        F.col(key_col), F.col("ref_ts").alias("__rb"),
        F.col("dsum").alias("__sb"), F.col("dcnt").alias("__cb"),
    )
    j = aa.join(bb, key_col, "full_outer")
    ref = F.greatest(F.col("__ra"), F.col("__rb"))
    ref = F.coalesce(ref, F.col("__ra"), F.col("__rb"))
    wa = F.pow(F.lit(0.5), (ref - F.col("__ra")) / hl)
    wb = F.pow(F.lit(0.5), (ref - F.col("__rb")) / hl)
    return j.select(
        F.col(key_col),
        ref.alias("ref_ts"),
        (F.coalesce(F.col("__sa") * wa, F.lit(0.0)) + F.coalesce(F.col("__sb") * wb, F.lit(0.0))).alias("dsum"),
        (F.coalesce(F.col("__ca") * wa, F.lit(0.0)) + F.coalesce(F.col("__cb") * wb, F.lit(0.0))).alias("dcnt"),
    )


def finalize_decayed(
    state: DataFrame,
    key_col: str,
    *,
    half_life_seconds: float,
    asof,
    round_digits: int = 6,
) -> DataFrame:
    """Evaluate a decayed-counter state at ``asof`` — same output shape as
    :func:`decayed_agg` (decayed_sum/decayed_count/decayed_mean), for
    serving the ONLINE counter a streaming sink maintains."""
    w = F.pow(
        F.lit(0.5),
        (_secs(F.lit(asof)) - F.col("ref_ts")) / F.lit(float(half_life_seconds)),
    )
    return state.select(
        F.col(key_col),
        F.round(F.col("dsum") * w, round_digits).alias("decayed_sum"),
        F.round(F.col("dcnt") * w, round_digits).alias("decayed_count"),
        F.round(
            (F.col("dsum") * w) / (F.col("dcnt") * w), round_digits
        ).alias("decayed_mean"),
    )


def robust_scale(
    df: DataFrame,
    cols: list[str],
    *,
    round_digits: int = 6,
    suffix: str = "_r",
) -> DataFrame:
    """Median/IQR scaling — the outlier-immune sibling of
    :func:`standard_scale` (a single 10⁹× corrupt value shifts a z-score's
    mean/std arbitrarily; it moves the median/IQR not at all). Same
    plan shape: ONE exact-percentile aggregate broadcasts into the scan
    expression. Zero-IQR columns scale to 0.0."""
    aggs = [
        F.expr(f"percentile(`{c}`, array(0.25, 0.5, 0.75))").alias(f"__q_{c}")
        for c in cols
    ]
    stats = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(stats))
    for c in cols:
        med = F.col(f"__q_{c}")[1]
        iqr = F.col(f"__q_{c}")[2] - F.col(f"__q_{c}")[0]
        r = F.when(iqr > 0, (F.col(c) - med) / iqr).otherwise(
            F.when(F.col(c).isNotNull(), F.lit(0.0))
        )
        out = out.withColumn(f"{c}{suffix}", F.round(r, round_digits))
    return out.drop(*[f"__q_{c}" for c in cols])


def target_encode_oof(
    df: DataFrame,
    cat_col: str,
    label_col: str,
    fold_key_col: str,
    *,
    k: int = 5,
    prior_weight: float = 10.0,
    salt: str = "",
    round_digits: int = 9,
) -> DataFrame:
    """OUT-OF-FOLD smoothed target encoding — the leakage-safe variant:
    each row's encoding uses only label statistics from the OTHER k−1
    folds, so a row's own label never contributes to its own feature (the
    classic target-leak that makes in-sample target encodings look
    spuriously predictive). Folds are md5-deterministic per
    ``fold_key_col`` (``sampling.fold_column``), so train-time and
    audit-time runs agree across engines and partitionings.

    Output: the ``(cat, fold, n_oof, enc)`` encoder table (category × k
    rows — the artifact to persist next to the model; serve-time rows
    outside the training set use the ALL-folds :func:`target_encode`).
    ``enc = ((s_cat − s_cat,fold) + m·g) / ((n_cat − n_cat,fold) + m)``
    with ``g`` the full-corpus mean (documented simplification: the prior
    leaks one global scalar, not per-row labels). A category entirely
    inside one fold encodes to the prior — the shrinkage limit.

    Scale shape: ONE partial-aggregated groupBy over (cat, fold) — at
    most k× the plain encoder's aggregate rows; category totals re-derive
    from that table (no second scan); everything downstream broadcasts.
    """
    from .sampling import fold_column

    per_cf = df.groupBy(
        F.col(cat_col), fold_column(F.col(fold_key_col), k, salt=salt).alias("fold")
    ).agg(
        F.count(label_col).alias("__nf"),
        dsum(F.col(label_col)).alias("__sf"),
    )
    per_cat = per_cf.groupBy(cat_col).agg(
        F.sum("__nf").alias("__n"),
        F.sum(F.col("__sf").cast("decimal(28,4)")).cast("double").alias("__s"),
    )
    tot = per_cat.agg(
        F.sum("__n").alias("__tn"),
        F.sum(F.col("__s").cast("decimal(28,4)")).cast("double").alias("__ts"),
    )
    m = F.lit(float(prior_weight))
    g = F.col("__ts") / F.col("__tn")
    return (
        per_cf.join(F.broadcast(per_cat), cat_col)
        .crossJoin(F.broadcast(tot))
        .select(
            F.col(cat_col),
            "fold",
            (F.col("__n") - F.col("__nf")).cast("long").alias("n_oof"),
            F.round(
                ((F.col("__s") - F.col("__sf")) + m * g)
                / ((F.col("__n") - F.col("__nf")) + m),
                round_digits,
            ).alias("enc"),
        )
    )


def trend_slope(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    round_digits: int = 6,
) -> DataFrame:
    """Per-key OLS trend slope of ``value`` over time, in value-units per
    DAY — the classic "is this user's spend trending up" feature. One
    aggregation pass via the closed form
    ``slope = (n·Σtv − Σt·Σv) / (n·Σt² − (Σt)²)``.

    Engine-exact and numerically sound:

    - times enter as INTEGER microseconds RE-CENTERED on the dataset-wide
      minimum (one scalar aggregate, broadcast) — centering bounds the
      classic catastrophic cancellation in ``n·Σt² − (Σt)²`` by the data's
      own span instead of the Unix epoch's;
    - values truncate to DECIMAL(18,6); all five sums accumulate as exact
      decimals (order-free), so every engine and partitioning produces the
      SAME sums;
    - the final combine casts each exact sum to double — IEEE arithmetic
      on identical doubles is identical everywhere — and rounds.

    Returns (key, n_events, slope_per_day); slope is NULL for keys with a
    zero time variance (one event, or all events at one timestamp).

    Scale shape: one broadcast scalar + one map-side-combined groupBy —
    shuffle carries five decimal partials per (partition, key).
    """
    t0 = df.agg(F.min(F.unix_micros(F.col(ts_col))).alias("__t0"))
    base = df.crossJoin(F.broadcast(t0)).select(
        F.col(key_col),
        (F.unix_micros(F.col(ts_col)) - F.col("__t0")).alias("__t"),
        F.col(value_col).cast("decimal(18,6)").alias("__v"),
    )
    agg = base.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.col("__t").cast("decimal(38,0)")).alias("__st"),
        F.sum(F.col("__v")).alias("__sv"),
        # t² must multiply as DECIMAL: centered micros reach ~3e13, whose
        # square (~1e27) silently overflows int64
        F.sum(
            (F.col("__t").cast("decimal(19,0)") * F.col("__t").cast("decimal(19,0)"))
            .cast("decimal(38,0)")
        ).alias("__stt"),
        F.sum((F.col("__t").cast("decimal(18,0)") * F.col("__v")).cast("decimal(38,6)")).alias("__stv"),
    )
    n = F.col("n_events").cast("double")
    st = F.col("__st").cast("double")
    sv = F.col("__sv").cast("double")
    stt = F.col("__stt").cast("double")
    stv = F.col("__stv").cast("double")
    den = n * stt - st * st
    micros_per_day = F.lit(86400.0 * 1e6)
    slope = F.when(den > 0, (n * stv - st * sv) / den * micros_per_day)
    return agg.select(
        key_col,
        "n_events",
        F.round(slope, round_digits).alias("slope_per_day"),
    )


def calendar_features(
    df: DataFrame,
    ts_col: str,
    *,
    prefix: str = "",
) -> DataFrame:
    """Standard calendar feature block from a timestamp — the first
    feature family every tabular model gets: ISO weekday (1 = Monday),
    hour, day-of-month, month, year, ISO week, and an ``is_weekend``
    flag. Pure projection (zero shuffles); ISO conventions pinned
    explicitly because engines disagree on bare ``dayofweek`` (Spark's
    is 1 = Sunday — never expose that trap downstream).
    """
    t = F.col(ts_col)
    p = prefix
    return df.select(
        "*",
        (F.weekday(t) + 1).cast("int").alias(f"{p}dow_iso"),
        F.hour(t).cast("int").alias(f"{p}hour"),
        F.dayofmonth(t).cast("int").alias(f"{p}day"),
        F.month(t).cast("int").alias(f"{p}month"),
        F.year(t).cast("int").alias(f"{p}year"),
        F.weekofyear(t).cast("int").alias(f"{p}week_iso"),
        (F.weekday(t) >= 5).alias(f"{p}is_weekend"),
    )


def quantile_transform(
    df: DataFrame,
    value_col: str,
    *,
    out_col: str = "quantile",
    n_bands: int = 256,
    round_digits: int = 9,
) -> DataFrame:
    """Rank-to-uniform quantile transform — map each value to its
    empirical quantile ``(avg_rank − 0.5) / N`` in (0, 1), the
    distribution-free scaling that kills outliers and skew entirely
    (sklearn's ``QuantileTransformer`` with a uniform target, exact
    instead of subsampled). Ties share one quantile (average rank);
    NULL values pass through as NULL ``out_col``.

    Scale shape: one banded rank pass
    (:func:`~.drift.banded_avg_rank` — no global single-task sort) over
    the non-NULL rows, unioned with the NULL rows untouched.

    Exactness: avg ranks are half-integers; ``(r − 0.5)/N`` on identical
    doubles is engine-identical; rounding is display-stability only.
    """
    from .drift import banded_avg_rank

    v = F.col(value_col)
    nn = df.filter(v.isNotNull())
    nulls = df.filter(v.isNull()).withColumn(out_col, F.lit(None).cast("double"))
    # return_count reuses the bounds probe's total — no third full scan
    ranked, n = banded_avg_rank(
        nn, value_col, n_bands=n_bands, rank_col="__r", return_count=True
    )
    out = ranked.withColumn(
        out_col,
        F.round((F.col("__r") - F.lit(0.5)) / F.lit(float(n)), round_digits),
    ).drop("__r")
    return out.unionByName(nulls)


def woe_iv(
    df: DataFrame,
    cat_col: str,
    label: Column,
    *,
    smoothing: float = 0.5,
    round_digits: int = 6,
) -> DataFrame:
    """Weight-of-evidence encoding + information-value terms per category
    — the credit-scoring-standard supervised encoding for binary targets:
    ``woe = ln((pos_c/pos_tot) / (neg_c/neg_tot))`` with ``smoothing``
    added to every cell (so empty cells stay finite), and
    ``iv_term = (pos_c/pos_tot − neg_c/neg_tot) · woe`` (sum the terms
    for the feature's total IV; >0.3 = strong predictor). ``label`` is a
    boolean Column; NULL labels are excluded, NULL categories group as a
    real level (they carry signal). Output per category:
    (category, n_pos, n_neg, woe, iv_term).

    Exactness: counts are exact longs; totals broadcast from a 1-row
    aggregate; the smoothed ratio closed form runs in identical IEEE
    doubles both engines.

    Scale shape: ONE map-side-combinable (category) aggregate + a 1-row
    cross join — dimension-sized everything after the scan.
    """
    base = df.filter(label.isNotNull()).select(
        F.col(cat_col).alias("category"), label.cast("int").alias("__y")
    )
    per_cat = base.groupBy("category").agg(
        F.sum("__y").cast("long").alias("n_pos"),
        F.sum(F.lit(1) - F.col("__y")).cast("long").alias("n_neg"),
    )
    tot = per_cat.agg(
        F.sum("n_pos").alias("__tp"),
        F.sum("n_neg").alias("__tn"),
        F.count(F.lit(1)).alias("__k"),
    )
    j = per_cat.crossJoin(F.broadcast(tot))
    s = F.lit(smoothing)
    # smoothed totals add one `smoothing` per category so the per-category
    # fractions still sum to 1 across levels
    p = (F.col("n_pos") + s) / (F.col("__tp") + s * F.col("__k"))
    q = (F.col("n_neg") + s) / (F.col("__tn") + s * F.col("__k"))
    woe = F.log(p / q)
    return j.select(
        "category",
        "n_pos",
        "n_neg",
        F.round(woe, round_digits).alias("woe"),
        F.round((p - q) * woe, round_digits).alias("iv_term"),
    )


def count_encode(
    df: DataFrame,
    cat_col: str,
    *,
    out_prefix: str | None = None,
    round_digits: int = 9,
) -> DataFrame:
    """Count/frequency encoding of a categorical — replace the level with
    how often it occurs (the cheapest supervision-free high-cardinality
    encoder; tree models split on it directly). Appends
    ``{prefix}_count``, ``{prefix}_freq`` and ``{prefix}_log_count``
    (ln(1+count), the scale trees and linear models both tolerate);
    NULL categories get encoded from their own (NULL-level) count —
    missingness is signal.

    Scale shape: one map-side-combinable category aggregate broadcast
    back onto the scan — dimension-sized join, no fact shuffle. The
    denominator for ``_freq`` is the SUM of the per-category counts (a
    1-row aggregate over the dimension-sized ``counts``, broadcast in),
    not an eager ``df.count()`` — the old eager count charged a full
    extra fact scan at plan-BUILD time and broke laziness (r7 ADVICE).
    """
    p = out_prefix or cat_col
    counts = df.groupBy(F.col(cat_col).alias("__cat")).agg(
        F.count(F.lit(1)).cast("long").alias(f"{p}_count")
    )
    total = counts.agg(
        F.sum(f"{p}_count").cast("double").alias("__total")
    )
    enc = counts.crossJoin(F.broadcast(total)).select(
        "__cat",
        f"{p}_count",
        F.round(F.col(f"{p}_count") / F.col("__total"), round_digits).alias(
            f"{p}_freq"
        ),
        F.round(F.log(F.lit(1.0) + F.col(f"{p}_count")), round_digits).alias(
            f"{p}_log_count"
        ),
    )
    return df.join(
        F.broadcast(enc), df[cat_col].eqNullSafe(enc["__cat"]), "left"
    ).drop("__cat")
