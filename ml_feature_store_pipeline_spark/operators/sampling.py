"""Deterministic sampling & splits for training-data pipelines.

Random ``df.sample`` is irreproducible across runs/engines and unstable
under repartitioning. Everything here buckets rows by ``md5`` of a key —
the same row lands in the same bucket on any engine, any partitioning,
any day, so samples are auditable and splits never leak between train and
test as data grows (a new row's split is a pure function of its key).

All expressions are hex-string → integer conversions inside codegen — no
shuffle, no UDF; a sample is a pushed-down filter on top of the scan.
``stratified_sample`` wraps ``sampleBy`` for the seeded-random variant and
is flagged non-reproducible across engines.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column, buckets: int, salt: str = "") -> Column:
    """Deterministic bucket in [0, buckets): first 8 hex chars of
    ``md5(salt || key)`` as an integer, mod buckets. Engine-portable
    (DuckDB twin: ``CAST(concat('0x', substr(md5(...), 1, 8)) AS BIGINT)``)."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % buckets


def deterministic_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    *,
    buckets: int = 10000,
    salt: str = "",
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash. Reproducible and
    stable: the same keys survive regardless of partitioning or engine;
    ``salt`` selects an independent sample."""
    cut = int(round(fraction * buckets))
    return df.filter(hash_bucket(F.col(key_col), buckets, salt) < cut)


def train_test_split(
    df: DataFrame,
    key_col: str,
    test_fraction: float = 0.2,
    *,
    buckets: int = 10000,
    salt: str = "",
) -> tuple[DataFrame, DataFrame]:
    """Leakage-safe split: a key's assignment never changes as the table
    grows, and grouping the split by an ENTITY key (user, document) rather
    than a row id keeps correlated rows on one side."""
    cut = int(round(test_fraction * buckets))
    bucket = hash_bucket(F.col(key_col), buckets, salt)
    return df.filter(bucket >= cut), df.filter(bucket < cut)


def split_column(
    key: Column,
    test_fraction: float = 0.2,
    *,
    buckets: int = 10000,
    salt: str = "",
) -> Column:
    """The split as a labeling column ('train' / 'test') for single-pass
    writes partitioned by split."""
    cut = int(round(test_fraction * buckets))
    return F.when(hash_bucket(key, buckets, salt) < cut, F.lit("test")).otherwise(
        F.lit("train")
    )


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-stratum random sampling (``sampleBy``). Seeded but NOT
    engine-portable or partitioning-stable — prefer
    :func:`stratified_sample_deterministic` for anything that must be
    reproduced."""
    return df.sampleBy(strata_col, fractions, seed)


def stratified_sample_deterministic(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    *,
    default_fraction: float = 0.0,
    buckets: int = 10000,
    salt: str = "",
) -> DataFrame:
    """Per-stratum md5-bucket sampling — the engine-portable, partitioning-
    stable twin of ``sampleBy``, for class-balancing training mixes (e.g.
    downsample boilerplate web text, keep all books).

    The stratum only chooses the CUT; membership is still a pure function
    of the key, so enlarging one stratum's fraction strictly grows its
    sample (nested samples — handy for data-mix ablations). Unlisted strata
    get ``default_fraction``. Pure codegen filter on the scan, no shuffle.
    """
    cut_map = F.create_map(
        *[x for k, v in fractions.items()
          for x in (F.lit(k), F.lit(int(round(v * buckets))))]
    )
    cut = F.coalesce(
        cut_map[F.col(strata_col)], F.lit(int(round(default_fraction * buckets)))
    )
    return df.filter(hash_bucket(F.col(key_col), buckets, salt) < cut)


def fold_column(key: Column, k: int = 5, *, salt: str = "") -> Column:
    """K-fold cross-validation assignment in [0, k): deterministic per key,
    so folds are reproducible and entity-keyed folds keep a user's rows in
    one fold. Use a distinct ``salt`` per experiment for fresh folds."""
    return hash_bucket(key, k, salt).cast("int")


def token_mixture_plan(
    df: DataFrame,
    source_col: str,
    n_tokens: Column,
    weights: dict[str, int],
) -> dict[str, tuple[int, int]]:
    """Per-source sampling cuts that rebalance a corpus to a TARGET TOKEN
    MIX — the data-mixing step of an LLM training recipe (weights are
    relative token shares, e.g. books:4, web:1).

    Kept tokens per source are made proportional to ``weights`` by
    downsampling everything to the binding source: c = min_s(T_s / w_s)
    (ties broken by source name), f_s = c·w_s / T_s ≤ 1, so expected kept
    tokens K_s = c·w_s ∝ w_s, total kept maximal without upsampling.

    Returns {source: (num, den)} with the keep fraction as the exact
    rational f_s = num/den = (T_m·w_s)/(w_m·T_s); the cut for ``buckets``
    b is ``(b·num) // den`` — ALL INTEGER arithmetic, so an external
    engine (the DuckDB oracle) computing the same formula lands on
    bit-identical cuts; a float f_s would risk rounding the cut
    differently on a last-ulp disagreement. Dropped sources (weight 0 or
    no tokens) get (0, 1).

    The aggregate this collects is |sources| rows (data mixes have tens of
    sources, not millions) — metadata-scale by nature, documented as such.
    Sources absent from ``weights`` get weight 0 (dropped)."""
    totals = {
        r["__src"]: r["__t"] or 0
        for r in df.groupBy(F.col(source_col).alias("__src"))
        .agg(F.sum(n_tokens).alias("__t"))
        .collect()
    }
    binding = min(
        ((src, t) for src, t in totals.items() if weights.get(src, 0) > 0 and t > 0),
        key=lambda kv: (kv[1] / weights[kv[0]], kv[0]),
        default=None,
    )
    if binding is None:
        return {src: (0, 1) for src in totals}
    t_m, w_m = binding[1], weights[binding[0]]
    return {
        src: (t_m * weights[src], w_m * t) if weights.get(src, 0) > 0 and t > 0 else (0, 1)
        for src, t in totals.items()
    }


def mixture_sample_by_tokens(
    df: DataFrame,
    key_col: str,
    source_col: str,
    weights: dict[str, int],
    *,
    n_tokens: Column,
    buckets: int = 10000,
    salt: str = "",
) -> DataFrame:
    """Deterministically sample ``df`` so kept TOKENS per source follow the
    ``weights`` mix (see :func:`token_mixture_plan`). Membership is the
    same md5-bucket predicate as every sampler here — a pure function of
    the key, stable under repartitioning, engine-portable, and nested
    (raising a weight strictly grows that source's sample).

    One |sources|-row aggregate chooses the cuts; the sample itself is a
    codegen filter on the scan — no shuffle of the data."""
    plan = token_mixture_plan(df, source_col, n_tokens, weights)
    cuts = {src: (buckets * num) // den for src, (num, den) in plan.items()}
    cut_map = F.create_map(*[x for k, v in cuts.items() for x in (F.lit(k), F.lit(v))])
    cut = F.coalesce(cut_map[F.col(source_col)], F.lit(0))
    return df.filter(hash_bucket(F.col(key_col), buckets, salt) < cut)


def epoch_mixture_plan(
    df: DataFrame,
    source_col: str,
    n_tokens: Column,
    target_tokens: dict[str, int],
    *,
    totals: dict[str, int] | None = None,
) -> dict[str, tuple[int, int, int]]:
    """Per-source repeat ratios that hit ABSOLUTE token budgets, allowing
    MULTI-EPOCH upsampling — the other half of the data-mix recipe that
    :func:`token_mixture_plan` (downsample-only) can't express: GPT-3
    trains Wikipedia ~3.4 epochs while Common Crawl sees <1 (Brown et al.
    2020 table 2.2), so a mixture operator must repeat small high-weight
    sources, not just cut large ones.

    For each source, the repeat ratio r_s = target_s / T_s splits into
    ``(base, frac_num, frac_den)`` with base = target_s // T_s and
    frac_num/frac_den = (target_s % T_s) / T_s — ALL INTEGER, so an
    external engine recomputing the same divisions lands on bit-identical
    plans (same rationale as :func:`token_mixture_plan`). Every row gets
    ``base`` full copies; a deterministic md5 draw grants one extra copy
    to a ``frac`` share of rows, so expected emitted tokens per source
    equal the budget. Sources without a budget (or with zero tokens) get
    (0, 0, 1) — dropped.

    The aggregate is |sources| rows — metadata-scale by nature.
    Callers that already hold the per-source token totals (e.g. they
    derived the budgets from the same aggregate) pass ``totals=`` to
    skip the corpus scan entirely."""
    if totals is None:
        totals = {
            r["__src"]: r["__t"] or 0
            for r in df.groupBy(F.col(source_col).alias("__src"))
            .agg(F.sum(n_tokens).alias("__t"))
            .collect()
        }
    plan: dict[str, tuple[int, int, int]] = {}
    for src, t in totals.items():
        tgt = int(target_tokens.get(src, 0))
        if t <= 0 or tgt <= 0:
            plan[src] = (0, 0, 1)
        else:
            plan[src] = (tgt // t, tgt % t, t)
    return plan


def proportional_targets(
    totals: dict[str, int], weights: dict[str, int], total_budget: int
) -> dict[str, int]:
    """Split ``total_budget`` tokens across sources ∝ ``weights`` (integer
    floor division, so engines agree exactly): target_s = ⌊budget·w_s/W⌋
    with W = Σ weights of sources that actually have tokens. Pure driver
    arithmetic over the |sources|-row totals dict."""
    w_sum = sum(
        w for s, w in weights.items() if w > 0 and totals.get(s, 0) > 0
    )
    if w_sum <= 0:
        return {s: 0 for s in totals}
    return {
        s: (total_budget * weights.get(s, 0)) // w_sum if totals.get(s, 0) > 0 else 0
        for s in totals
    }


def kl_mixture_weights(
    kl_by_source: dict[str, float], *, scale: int = 10000
) -> dict[str, int]:
    """Close the diagnose→act loop on mixture skew: turn the per-source
    unigram KL readout (``text.unigram_kl_by_source`` — "which source is
    dragging the token distribution") into the INTEGER weights that
    :func:`token_mixture_plan` / :func:`mixture_sample_by_tokens` take as
    targets. ``w_s = max(1, round_half_up(scale·e_s))`` with
    ``e_s = round(exp(−KL_s), 6)`` — a source that reads like the pooled
    corpus (KL → 0) keeps weight ≈ ``scale``; a source ``KL`` nats away
    is exponentially down-weighted (the softmax-temperature shape of
    DoReMi-style re-weighting, with the corpus itself as the reference
    domain); the ``max(1, ·)`` floor keeps every source represented
    rather than silently excluded.

    Engine-portable by construction, so a SQL oracle can land on the
    exact same integers: the input KL is the operator's 6 dp-rounded
    output (an identical double in any engine), ``exp`` of an identical
    double is libm-stable, the 6 dp round pins any residual last-ulp
    drift, and the half-up round to an integer runs in DECIMAL space
    (DuckDB twin:
    ``GREATEST(1, CAST(ROUND(CAST(ROUND(EXP(-kl), 6) AS DECIMAL(18,6))
    * scale, 0) AS BIGINT))``). Pure |sources|-sized driver arithmetic —
    metadata-scale, like every mixture plan here."""
    from decimal import ROUND_HALF_UP, Decimal

    out: dict[str, int] = {}
    for src, kl in kl_by_source.items():
        e6 = round(math.exp(-float(kl)), 6)
        w = int(
            (Decimal(str(e6)) * scale).to_integral_value(rounding=ROUND_HALF_UP)
        )
        out[src] = max(1, w)
    return out


def mixture_sample_epochs(
    df: DataFrame,
    key_col: str,
    source_col: str,
    target_tokens: dict[str, int],
    *,
    n_tokens: Column,
    buckets: int = 10000,
    salt: str = "",
    epoch_col: str = "epoch",
    totals: dict[str, int] | None = None,
) -> DataFrame:
    """Materialize a data mixture with per-source ABSOLUTE token budgets,
    repeating rows for budgets above the source's size (multi-epoch) and
    md5-downsampling for budgets below — see :func:`epoch_mixture_plan`.
    Each emitted row carries ``epoch_col`` (0-based copy index), so a
    trainer (or :func:`~.layout.training_shards`) can salt per-epoch
    shuffle order and dedup never mistakes the copies for corruption.

    Scale shape: one |sources|-row aggregate picks the plan; the
    expansion itself is a codegen ``explode(sequence(...))`` on the scan —
    per-row fan-out with NO shuffle and no driver data. Copy counts are a
    pure function of (key, source), stable under repartitioning and
    engine-portable: the extra fractional copy uses the same md5-bucket
    predicate as every sampler here, with the cut ⌊buckets·frac_num/
    frac_den⌋ in exact integer arithmetic."""
    plan = epoch_mixture_plan(df, source_col, n_tokens, target_tokens, totals=totals)
    base_map = F.create_map(
        *[x for s, (b, _n, _d) in plan.items() for x in (F.lit(s), F.lit(b))]
    )
    cut_map = F.create_map(
        *[
            x
            for s, (_b, n, d) in plan.items()
            for x in (F.lit(s), F.lit((buckets * n) // d))
        ]
    )
    base = F.coalesce(base_map[F.col(source_col)], F.lit(0))
    cut = F.coalesce(cut_map[F.col(source_col)], F.lit(0))
    extra = (hash_bucket(F.col(key_col), buckets, salt) < cut).cast("int")
    n_copies = base + extra
    # sequence(0, -1) would infer step -1 and emit [0, -1]; guard with an
    # empty array so zero-copy rows vanish through the explode
    copies = F.when(
        n_copies > 0, F.sequence(F.lit(0), n_copies - F.lit(1))
    ).otherwise(F.array().cast("array<int>"))
    return df.withColumn(epoch_col, F.explode(copies))


def dense_index(
    df: DataFrame,
    order_col: str | list[str],
    *,
    idx_col: str = "__idx",
    n_rows: int | None = None,
    rows_per_partition: int = 2_000_000,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Dense ``0..n−1`` index over ``df`` ordered by ``order_col`` (one
    column name or a composite list; the ordering tuples must be
    distinct), WITHOUT serializing the table through one task.

    ``row_number() OVER (ORDER BY order_col)`` — the obvious form — has an
    empty partition spec, so Spark exchanges every row to a single task: a
    non-issue for small dims, a serialization point for a 100M-row
    catalog. This is the parallel two-level equivalent:

    1. ``repartitionByRange(order_col)`` — partition *i* holds an
       ascending, non-overlapping value range;
    2. ``row_number()`` per partition (parallel windows, keyed by the
       range-partition id);
    3. per-partition row counts → cumulative offsets (ONE collect of
       #partitions rows — never data);
    4. global index = offset(partition) + local rank − 1.

    Because range partitions are ascending in partition id and values are
    distinct, the result is bit-identical to the single-task window for
    ANY boundary choice (equivalence-tested), so md5-draw recipes built on
    the index (:func:`negative_sample`) are unchanged.

    The range partitioning is PINNED with an eager checkpoint before the
    sizes collect — but only when ``n_parts > 1`` (r6 ADVICE):
    ``repartitionByRange`` picks its boundaries by reservoir-sampling the
    input, and when the sample is partial the sampler's seed varies per
    execution — so without the checkpoint, the sizes job and each
    downstream consumer job could each re-execute the exchange with
    DIFFERENT boundaries, silently mismatching the baked offset map
    (duplicate/skipped global indices) at exactly the scale this function
    exists for. With a single partition there is no boundary sampling and
    no nondeterminism, so the common small-vocab path (index_encode
    vocabularies, negative-sample item dims) stays a lazy plan and pays
    no materialization job. The checkpoint truncates lineage, so a lost
    block is a loud recompute failure, never a silent re-sample; blocks
    are freed with the session (the returned plan keeps consuming them,
    so there is no safe unpersist point inside this function).

    ``reliable_checkpoint=True`` uses ``df.checkpoint()`` (the caller
    must have set ``spark.sparkContext.setCheckpointDir``) instead of
    ``localCheckpoint()``. Default-off trade (r6 ADVICE): local
    checkpoint blocks are executor-local and NON-replicated, so under
    ``spark.dynamicAllocation`` (or any executor loss) every downstream
    consumer of the returned plan fails unrecoverably — loud, but fatal
    to a long-lived session. Deployments with dynamic allocation should
    pass ``reliable_checkpoint=True`` and eat the DFS round-trip.
    """
    from pyspark.sql.window import Window

    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    if n_rows is None:
        n_rows = df.count()
    n_parts = max(1, min(2048, -(-n_rows // rows_per_partition)))
    ranged = (
        df.repartitionByRange(n_parts, *[F.col(c) for c in order_cols])
        .withColumn("__pid", F.spark_partition_id())
    )
    if n_parts > 1:
        # partial reservoir sample → nondeterministic boundaries → pin
        ranged = (
            ranged.checkpoint(eager=True)
            if reliable_checkpoint
            else ranged.localCheckpoint(eager=True)
        )
    else:
        # deterministic (no boundary sampling), so lineage can stay — but
        # the sizes collect AND every downstream consumer execute this
        # subplan, so cache it lazily: materializes as a side effect of
        # the sizes job (no extra job, unlike the eager checkpoint), and a
        # lost block recomputes identically instead of failing
        ranged = ranged.persist()
    sizes = sorted(
        (r["__pid"], r["cnt"])
        for r in ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for pid, cnt in sizes:
        offsets[pid] = acc
        acc += cnt
    off_map = F.create_map(*[x for k, v in offsets.items() for x in (F.lit(k), F.lit(v))])
    local = F.row_number().over(Window.partitionBy("__pid").orderBy(*order_cols))
    return (
        ranged.withColumn(idx_col, off_map[F.col("__pid")] + local - 1)
        .drop("__pid")
    )


def negative_sample(
    positives: DataFrame,
    items: DataFrame,
    *,
    user_col: str,
    item_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic negative sampling for pairwise training data: for each
    positive ``(user, item)`` row, draw ``k`` uniform candidate items from
    the ``items`` universe, then drop candidates that are actually
    positives for that user (the standard recsys / contrastive recipe).
    Output: ``(user_col, item_col, label=0)`` candidate rows — union with
    the positives (label=1) for the final training set.

    Draws are md5-derived from ``(user, item, draw_index, salt)``, so the
    sample is reproducible across runs, engines, and partitionings — a
    rerun or a serving-side rebuild picks the SAME negatives (the property
    that makes offline metrics comparable between pipelines).

    Scale shape: the item universe gets a dense 0..n−1 index via a
    TWO-LEVEL rank (:func:`dense_index` — range-partition, rank within
    each partition in parallel, add per-partition offsets) and is
    broadcast; drawing is a ×k literal-sequence explode + broadcast
    equi-join on the index; the final subtraction is a shuffle-free
    broadcast anti join when positives-per-user fit the broadcast
    threshold, else one shuffle on (user, item). Nothing fact-sized is
    ever collected, and no single task ever holds the whole catalog (the
    r4 form ranked the dim through one `Window.orderBy` task — fine for
    dim-sized catalogs, a serialization point for a 100M-item one).
    """
    n_items = items.select(item_col).distinct().count()
    if n_items == 0:
        raise ValueError("empty item universe")
    indexed = F.broadcast(dense_index(items.select(item_col).distinct(), item_col, n_rows=n_items))
    draws = positives.select(user_col, item_col).withColumn(
        "__j", F.explode(F.array(*[F.lit(j) for j in range(k)]))
    )
    h = F.md5(
        F.concat_ws(
            ":",
            F.lit(salt),
            F.col(user_col).cast("string"),
            F.col(item_col).cast("string"),
            F.col("__j").cast("string"),
        )
    )
    idx = F.conv(F.substring(h, 1, 13), 16, 10).cast("long") % n_items
    cand = (
        draws.withColumn("__idx", idx)
        .drop(item_col)
        .join(indexed, "__idx")
        .select(user_col, item_col)
        .distinct()
    )
    return cand.join(
        positives.select(user_col, item_col).distinct(), [user_col, item_col], "left_anti"
    ).withColumn("label", F.lit(0))


def negative_sample_sql(
    positives_cte: str,
    items_cte: str,
    *,
    user_expr: str,
    item_expr: str,
    k: int,
    salt: str = "",
    n_items_expr: str | None = None,
) -> str:
    """DuckDB twin of :func:`negative_sample` (same md5 draw, same dense
    index). ``positives_cte``/``items_cte`` are CTE names defined by the
    caller; items must expose the item column named ``{item_expr}``."""
    n = n_items_expr or f"(SELECT COUNT(DISTINCT {item_expr}) FROM {items_cte})"
    fold = (
        "CAST(list_sum(list_transform(range(13), i -> "
        "(strpos('0123456789abcdef', substr(md5("
        f"'{salt}' || ':' || CAST(p.{user_expr} AS VARCHAR) || ':' || "
        f"CAST(p.{item_expr} AS VARCHAR) || ':' || CAST(j AS VARCHAR)"
        "), i + 1, 1)) - 1) * power(16, 12 - i))) AS BIGINT)"
    )
    return f"""
    WITH __idx AS (
      SELECT {item_expr}, ROW_NUMBER() OVER (ORDER BY {item_expr}) - 1 AS idx
      FROM (SELECT DISTINCT {item_expr} FROM {items_cte})
    ),
    __draws AS (
      SELECT DISTINCT i.{item_expr} AS {item_expr}, p.{user_expr} AS {user_expr}
      FROM {positives_cte} p
      CROSS JOIN UNNEST(generate_series(0, {k - 1})) AS u(j)
      JOIN __idx i ON i.idx = ({fold} % {n})
    )
    SELECT d.{user_expr}, d.{item_expr}, 0 AS label
    FROM __draws d
    WHERE NOT EXISTS (
      SELECT 1 FROM {positives_cte} q
      WHERE q.{user_expr} = d.{user_expr} AND q.{item_expr} = d.{item_expr}
    )
    """


def experiment_assignment(
    df: DataFrame,
    key_col: str,
    *,
    salt: str,
    arms: dict[str, float],
    arm_col: str = "arm",
) -> DataFrame:
    """Deterministic A/B-experiment assignment: each key lands in an arm
    by its md5 hash fraction of ``salt:key`` against the arms' cumulative
    weight thresholds — sticky across runs, engines, and partitionings
    (the same uniform the samplers use), independent across experiments
    via ``salt``. Weights are normalized; arm order follows the dict.

    Pure projection — zero shuffles; assignment happens wherever the row
    already is. That is the property that matters at 100 TB: the arm is
    a FUNCTION of the key, not a stored table to join.
    """
    from .sketches import hash_fraction

    total = float(sum(arms.values()))
    if total <= 0:
        raise ValueError("arm weights must sum to > 0")
    h = hash_fraction(F.concat(F.lit(f"{salt}:"), F.col(key_col).cast("string")))
    expr = None
    cum = 0.0
    names = list(arms)
    for name in names[:-1]:
        cum += arms[name] / total
        cond = h < cum
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(arm_col, expr)


def srm_check(
    assigned: DataFrame,
    arm_col: str,
    arms: dict[str, float],
    *,
    round_digits: int = 6,
) -> DataFrame:
    """Sample-ratio-mismatch check for an experiment assignment: one row
    per arm with the observed count/fraction, the design fraction, and
    the chi-square contribution ``(n − e·N)²/(e·N)`` — sum the column
    against χ²(arms−1); a significant SRM means the assignment or
    logging pipeline is broken and the experiment readout is void.
    Arms with zero observations still appear. One |arms|-group count.
    """
    total_w = float(sum(arms.values()))
    spark = assigned.sparkSession
    design = spark.createDataFrame(
        [(k, v / total_w) for k, v in arms.items()], f"{arm_col} string, expected_frac double"
    )
    obs = assigned.groupBy(arm_col).agg(F.count(F.lit(1)).alias("n"))
    tot = obs.agg(F.sum("n").alias("__t"))
    j = (
        design.join(F.broadcast(obs), arm_col, "left")
        .crossJoin(F.broadcast(tot))
        .select(
            arm_col,
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
            (F.coalesce("n", F.lit(0)) / F.col("__t")).alias("__of"),
            F.col("expected_frac"),
            F.col("__t"),
        )
    )
    chi2 = F.pow(F.col("n") - F.col("expected_frac") * F.col("__t"), F.lit(2.0)) / (
        F.col("expected_frac") * F.col("__t")
    )
    return j.select(
        arm_col,
        "n",
        F.round("__of", round_digits).alias("observed_frac"),
        F.round("expected_frac", round_digits).alias("expected_frac"),
        F.round(chi2, round_digits).alias("chi2_contrib"),
    )


#: Poisson(1) CDF thresholds for the md5-uniform inverse-CDF draw behind
#: the one-pass bootstrap: a hash fraction u maps to the smallest k with
#: u < P(X ≤ k), capped at 8 (P(X > 8) ≈ 1e-5). Plan literals in both
#: engines, so replicate weights replay bit-for-bit.
_POISSON1_CDF: tuple[float, ...] = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
    0.9994058151824183,
    0.999916758850712,
    0.9999897508033253,
)


def _poisson_weight(u: Column) -> Column:
    w: Column | None = None
    for k, t in enumerate(_POISSON1_CDF):
        w = F.when(u < t, k) if w is None else w.when(u < t, k)
    return w.otherwise(F.lit(len(_POISSON1_CDF)))


def bootstrap_mean_ci(
    df: DataFrame,
    value_col: str,
    key_col: str,
    *,
    n_replicates: int = 16,
    salt: str = "",
    alpha: float = 0.05,
    round_digits: int = 6,
) -> DataFrame:
    """Percentile bootstrap confidence interval for the mean, via the
    POISSON BOOTSTRAP (Chamandy et al. 2012 — "Estimating uncertainty
    for massive data streams", the Google one-pass formulation):
    replicate b reweights each row by an independent Poisson(1) count
    drawn deterministically from ``md5('boot:{salt}:{b}:' || key)``, so
    all ``n_replicates`` resampled means come out of ONE aggregate —
    no data is ever copied or shuffled. Output one row:
    (n, mean, ci_lo, ci_hi, n_replicates) with the interpolated
    α/2 and 1−α/2 percentiles of the replicate means.

    Engine-stable: the Poisson inverse-CDF thresholds are plan literals;
    weighted sums run in DECIMAL(28,6); replicate means and the
    percentile interpolation are identical IEEE both engines. NULL
    values are excluded. (A replicate whose total weight lands on 0 —
    vanishingly unlikely past toy sizes — yields a NULL mean that the
    percentile skips.)

    Scale shape: one map-side-combinable aggregate with 2·B + 2 partials
    per partition (B weighted decimal sums + B weight counts), then the
    B-row replicate table aggregates on the driver side of a broadcast —
    zero row egress, no joins, no shuffle beyond the 1-row combine.
    Hashing is the per-row cost, so each md5 serves FOUR replicates: the
    32 hex chars split into four 8-hex (32-bit) uniforms — measured 4×
    cheaper than one md5 per replicate at 20 M rows, with 2⁻³² draw
    granularity (the coarsest Poisson threshold gap is ~1e-5 ≫ 2⁻³²).
    """
    v = F.col(value_col)
    base = df.filter(v.isNotNull()).select(
        F.col(key_col).cast("string").alias("__k"), v.alias("__v")
    )
    # hoist the md5s into explicit projection columns: aggregate-expression
    # CSE does NOT dedupe them (measured: inlining the hash per replicate
    # cost 4x the hashing), so each of the ceil(B/4) digests is named once
    n_hashes = (n_replicates + 3) // 4
    hashed = base.select(
        "__v",
        *[
            F.md5(F.concat(F.lit(f"boot:{salt}:{g_}:"), F.col("__k"))).alias(
                f"__h_{g_}"
            )
            for g_ in range(n_hashes)
        ],
    )
    dec = lambda c: c.cast("decimal(28,6)")
    aggs = [
        F.count(F.lit(1)).alias("__n"),
        F.sum(dec(F.col("__v"))).cast("double").alias("__sv"),
    ]
    for b in range(n_replicates):
        g_, j = divmod(b, 4)
        u = F.conv(
            F.substring(F.col(f"__h_{g_}"), 8 * j + 1, 8), 16, 10
        ).cast("double") / F.lit(float(16**8))
        w = _poisson_weight(u)
        aggs.append(F.sum(dec(w * F.col("__v"))).cast("double").alias(f"__ws_{b}"))
        aggs.append(F.sum(w).cast("long").alias(f"__wn_{b}"))
    base = hashed
    g = base.agg(*aggs)
    means = F.array(
        *[
            F.when(
                F.col(f"__wn_{b}") > 0, F.col(f"__ws_{b}") / F.col(f"__wn_{b}")
            )
            for b in range(n_replicates)
        ]
    )
    reps = g.select(
        "__n", "__sv", F.explode(means).alias("__m")
    )
    return reps.groupBy("__n", "__sv").agg(
        F.percentile(F.col("__m"), F.lit(alpha / 2)).alias("__lo"),
        F.percentile(F.col("__m"), F.lit(1 - alpha / 2)).alias("__hi"),
    ).select(
        F.col("__n").cast("long").alias("n"),
        F.round(F.col("__sv") / F.col("__n"), round_digits).alias("mean"),
        F.round(F.col("__lo"), round_digits).alias("ci_lo"),
        F.round(F.col("__hi"), round_digits).alias("ci_hi"),
        F.lit(n_replicates).cast("int").alias("n_replicates"),
    )


def bootstrap_mean_ci_sql(
    table: str,
    value_col: str,
    key_col: str,
    *,
    n_replicates: int = 16,
    salt: str = "",
    alpha: float = 0.05,
) -> str:
    """DuckDB twin of :func:`bootstrap_mean_ci` — the same md5 draws,
    Poisson thresholds, decimal sums, and interpolated percentiles."""
    def u_expr(b: int) -> str:
        g_, j = divmod(b, 4)
        md5 = f"md5('boot:{salt}:{g_}:' || k)"
        # 8-hex-digit positional fold == Spark's conv(substring(h, 8j+1, 8), 16, 10):
        # every intermediate integer is < 2^32, exact in double
        fold = (
            f"list_sum(list_transform(range(8), i -> "
            f"(strpos('0123456789abcdef', substr({md5}, {8 * j} + i + 1, 1)) - 1)"
            f" * 16.0 ** (7 - i)))"
        )
        return f"({fold} / {float(16 ** 8)!r})"

    us = ",\n             ".join(
        f"{u_expr(b)} AS u{b}" for b in range(n_replicates)
    )

    def case(b: int) -> str:
        whens = " ".join(
            f"WHEN u{b} < {t!r} THEN {k}" for k, t in enumerate(_POISSON1_CDF)
        )
        return f"CASE {whens} ELSE {len(_POISSON1_CDF)} END"

    ws = ",\n             ".join(f"{case(b)} AS w{b}" for b in range(n_replicates))
    gs = ",\n             ".join(
        f"CAST(SUM(CAST(w{b} * v AS DECIMAL(28,6))) AS DOUBLE) AS ws{b},\n"
        f"             CAST(SUM(w{b}) AS BIGINT) AS wn{b}"
        for b in range(n_replicates)
    )
    ms = ", ".join(
        f"CASE WHEN wn{b} > 0 THEN ws{b} / wn{b} END" for b in range(n_replicates)
    )
    return f"""
    WITH base AS (
      SELECT CAST({key_col} AS VARCHAR) AS k, {value_col} AS v
      FROM {table} WHERE {value_col} IS NOT NULL
    ),
    u AS (
      SELECT v,
             {us}
      FROM base
    ),
    w AS (
      SELECT v,
             {ws}
      FROM u
    ),
    g AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(v AS DECIMAL(28,6))) AS DOUBLE) AS sv,
             {gs}
      FROM w
    ),
    reps AS (SELECT n, sv, UNNEST([{ms}]) AS m FROM g)
    SELECT CAST(n AS BIGINT) AS n, ROUND(sv / n, 6) AS mean,
           ROUND(quantile_cont(m, {alpha / 2!r}), 6) AS ci_lo,
           ROUND(quantile_cont(m, {1 - alpha / 2!r}), 6) AS ci_hi,
           CAST({n_replicates} AS INTEGER) AS n_replicates
    FROM reps GROUP BY n, sv
    """
