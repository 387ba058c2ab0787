"""Iterative graph algorithms (beyond-reference; SURVEY §2 extension).

Connected components live in ``dedup`` (min-label propagation for the
near-dup clusters); this module adds PAGE RANK — the canonical iterative
join-aggregate loop, in a FIXED-POINT INTEGER formulation so a SQL oracle
that unrolls the same iterations (the MMR unrolled-CTE precedent)
reproduces every rank bit-for-bit.

Why fixed-point: float (and even decimal) formulations round each
iteration, and scale-9 ranks divided by small integer degrees land on
EXACT half-boundaries at the rounding digit systematically — where Spark's
shortest-repr HALF_UP and DuckDB's binary-value rounding disagree by one
ulp (found by the oracle-parity test; the error then compounds across
iterations). Integer arithmetic with floor division has no rounding step
at all: ranks are carried as units of 1e−9 and every operation is exact
on both engines by construction. The floor bias per operation is ≤ 1e−9 —
far below any use of a rank.

Scale shape per iteration: one join of the (src-keyed) edge list with the
|nodes| rank table + one map-side-combinable sum to |nodes| rows. Lineage
is cut with ``localCheckpoint`` every few iterations — the standard
iterative-algorithm discipline on Spark (without it the plan doubles per
iteration and the optimizer chokes long before the cluster does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed-point unit: ranks are longs counting 1e-9ths. 64-bit headroom:
#: the damping step computes damp_pct × Σ_in ≤ 100 × N × UNIT, so the
#: long path is safe to ~1e8 nodes; past that, lift the sums to
#: decimal(38,0) (DuckDB already promotes to HUGEINT).
UNIT = 1_000_000_000


def pagerank(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    *,
    iterations: int = 10,
    damping_pct: int = 85,
    checkpoint_every: int = 4,
    edges_per_partition: int | None = None,
) -> DataFrame:
    """Undirected PageRank over an edge list (multi-edges collapse; each
    edge contributes both directions). Returns (node, rank) with SCALED
    ranks — mean ≈ 1.0, i.e. classic rank × |nodes| — so values read as
    "this part is 38× as central as average" independent of graph size.

    ``damping_pct`` is an integer percentage (85 = the classic 0.85) —
    the fixed-point step is ``rank' = (100−d)·UNIT/100 + (d · Σ_in
    ⌊rank/deg⌋) div 100``, all in longs, exact on any engine.
    Undirected ⇒ no dangling nodes ⇒ no dangling-mass term.

    ``edges_per_partition`` opts into the CO-PARTITIONED edge pin for
    multi-node clusters (see the mechanics note below): the pinned edge
    and degree tables are hash(s)-partitioned into
    ⌈und_edges / edges_per_partition⌉ partitions so no iteration
    re-exchanges them — at the price of one up-front edge shuffle and a
    statically planned loop. Default None keeps the plain AQE loop,
    which WON every local measurement (2M edges: 9.2 s vs 10.7-16.5 s;
    20M edges: 102.6 s vs 119-135 s): in one JVM a shuffle is a local
    memory/disk copy, so eliminating the per-iteration edge exchange
    buys less than AQE's runtime re-planning. On a 1000-executor
    cluster that same exchange crosses the NETWORK ~iterations× on the
    fact-sized table — the regime the opt-in exists for (pick
    edges_per_partition ≈ a few million: at least cores partitions,
    ≤ ~128 MB of long pairs each). Both paths are bit-identical
    (equivalence-tested) and the co-partitioned plan shape — zero
    exchanges above the pinned scans — is pinned in test_joins.

    NOT THREAD-SAFE while pinning: the co-partitioned path briefly flips
    the session-global ``spark.sql.adaptive.enabled`` conf (restored in
    ``finally``), so a concurrently planned query on the SAME session
    loses AQE during that window. From a multi-threaded driver, call it
    on a dedicated ``spark.newSession()`` (shared SparkContext, isolated
    SQL conf).
    """
    if not 0 < damping_pct < 100:
        raise ValueError("damping_pct must be an integer in (0, 100)")
    if edges_per_partition is not None and edges_per_partition < 1:
        # r8 ADVICE: 0 reached the ceil-division as ZeroDivisionError only
        # AFTER paying the edge derivation + checkpoint + count, and a
        # negative value silently collapsed the pin to n_part=1 (a
        # single-partition edge table — the opposite of the opt-in's point).
        raise ValueError("edges_per_partition must be a positive integer")
    base = (100 - damping_pct) * UNIT // 100
    und = (
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .unionByName(
            edges.select(F.col(dst_col).alias("s"), F.col(src_col).alias("d"))
        )
        .distinct()
    )
    # pin the (possibly expensive) edge derivation ONCE — lazily it
    # re-executes inside every iteration's plan (measured 24 s → the pin
    # removes 10 recomputes of an 800k-edge self-join at sf0.1).
    und = und.localCheckpoint()
    if edges_per_partition is not None:
        # CO-PARTITIONED opt-in (see the docstring's trade note): re-pin
        # the edge table hash(s)-partitioned and derive degrees on the
        # same partitioning, so no iteration re-exchanges either — what
        # still shuffles per iteration is the contribution transpose s→d
        # (unavoidable) and the |nodes|-sized rank table. Mechanics:
        # - n_part = ⌈und_edges / edges_per_partition⌉ (the count is a
        #   metadata fold over already-materialized blocks), capped 2048.
        # - the re-pin runs with AQE OFF: under an adaptive plan,
        #   localCheckpoint's LogicalRDD records UNKNOWN output
        #   partitioning (it is only final after runtime re-planning),
        #   so every consumer would re-exchange the pinned table, which
        #   defeats the point. Measured on the executed plan: the AQE-off
        #   pin is what removes the per-iteration edge exchange (zero
        #   exchanges above the pinned scans — pinned in test_joins).
        # - the first pin's blocks stay resident behind the second
        #   (freed with the session) — transient 2× edge storage, the
        #   price of sizing n_part without recomputing the derivation.
        n_part = max(1, min(2048, -(-und.count() // edges_per_partition)))
        spark = edges.sparkSession
        aqe_was = spark.conf.get("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            und = und.repartition(n_part, F.col("s")).localCheckpoint()
            deg = (
                und.groupBy("s")
                .agg(F.count(F.lit(1)).alias("deg"))
                .localCheckpoint()
            )
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
    else:
        deg = und.groupBy("s").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint()
    nodes = deg.select(F.col("s").alias("node"))
    ranks = nodes.select("node", F.lit(UNIT).cast("long").alias("rank_fp"))
    for i in range(iterations):
        contrib = (
            und.join(ranks.withColumnRenamed("node", "s"), "s")
            .join(deg, "s")
            .select(
                F.col("d").alias("node"),
                F.expr("rank_fp div deg").alias("__c"),
            )
        )
        agg = contrib.groupBy("node").agg(F.sum("__c").alias("__sum"))
        new_fp = F.lit(base).cast("long") + F.expr(
            f"({damping_pct} * coalesce(__sum, 0L)) div 100"
        )
        ranks = nodes.join(agg, "node", "left").select(
            "node", new_fp.alias("rank_fp")
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint()
    return ranks.select(
        "node", (F.col("rank_fp").cast("double") / F.lit(float(UNIT))).alias("rank")
    )


def pagerank_sql(
    edges_sql: str,
    src: str,
    dst: str,
    *,
    iterations: int = 10,
    damping_pct: int = 85,
    top_k: int | None = None,
    node_alias: str = "node",
) -> str:
    """DuckDB oracle for :func:`pagerank`: the same fixed-point iterations
    UNROLLED as chained CTEs (aggregation is illegal in a recursive CTE
    member, and unrolling keeps every iteration literally inspectable —
    the MMR oracle's pattern). ``edges_sql`` must yield ``{src}, {dst}``.
    All arithmetic is integer (DuckDB promotes sums to HUGEINT; ``//`` on
    positives is the same floor as Spark's ``div``)."""
    base = (100 - damping_pct) * UNIT // 100
    parts = [
        f"e0 AS (SELECT {src} AS a, {dst} AS b FROM ({edges_sql}))",
        "und AS (SELECT DISTINCT s, d FROM (SELECT a AS s, b AS d FROM e0 UNION ALL SELECT b, a FROM e0))",
        "deg AS (SELECT s, COUNT(*) AS deg FROM und GROUP BY s)",
        f"r0 AS (SELECT s AS node, CAST({UNIT} AS BIGINT) AS rank_fp FROM deg)",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"""r{i} AS (
      SELECT n.node,
             CAST({base} + ({damping_pct} * COALESCE(SUM(r.rank_fp // dg.deg), 0)) // 100 AS BIGINT) AS rank_fp
      FROM (SELECT node FROM r0) n
      LEFT JOIN und u ON u.d = n.node
      LEFT JOIN r{i-1} r ON r.node = u.s
      LEFT JOIN deg dg ON dg.s = u.s
      GROUP BY n.node
    )"""
        )
    tail = (
        f"SELECT node AS {node_alias}, CAST(rank_fp AS DOUBLE) / {float(UNIT)!r} AS rank "
        f"FROM r{iterations}"
    )
    if top_k is not None:
        tail += f" ORDER BY rank DESC, node ASC LIMIT {top_k}"
    return "WITH " + ",\n".join(parts) + "\n" + tail


def triangle_stats(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    *,
    round_digits: int = 6,
) -> DataFrame:
    """Exact triangle count + global clustering coefficient of an
    undirected graph — the cohesion readout for co-occurrence graphs
    (co-purchase, co-session): one row (n_nodes, n_edges, n_triangles,
    n_wedges, gcc) with ``gcc = 3·triangles / wedges``.

    Algorithm: the DEGREE-ORIENTED node-iterator — every edge is oriented
    from its lower-(degree, id) endpoint to the higher, so each triangle
    is counted exactly once as a wedge (u→v, u→w) closed by (v→w), and
    the wedge fan-out is bounded by the oriented OUT-degree, which is
    O(√m) amortized on any graph — the standard defense against the
    power-law hub that makes the naive a<b wedge join quadratic in the
    hub degree.

    Exactness: everything is integer joins and counts; wedge sums go
    through DECIMAL(38,0) (Σ deg·(deg−1) cubes past int64 only beyond
    ~3e9-degree hubs); ``gcc`` is one double division, identical both
    engines.

    Scale shape: canonical edges localCheckpoint once (they feed the
    degree table, the orientation join, and all three legs of the wedge
    join — the PageRank pin discipline); degrees broadcast-join back onto
    edges; the closing join is edge-keyed equi-join, never a cross.
    """
    a, b = F.col(src_col), F.col(dst_col)
    canon = (
        edges.filter(a != b)
        .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .distinct()
        .localCheckpoint()
    )
    deg = (
        canon.select(F.col("a").alias("v"))
        .unionAll(canon.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("__da"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("__db"))
    keyed = canon.join(da, "a").join(db, "b")
    fwd = (F.col("__da") < F.col("__db")) | (
        (F.col("__da") == F.col("__db")) & (F.col("a") < F.col("b"))
    )
    o = keyed.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("w"),
    ).localCheckpoint()
    # wedges (u -> v1, u -> v2) with v1 < v2 in plain id order (any total
    # order works — each unordered pair once), closed by an oriented edge
    # in EITHER direction between v1 and v2
    e1 = o.select(F.col("u"), F.col("w").alias("v1"))
    e2 = o.select(F.col("u"), F.col("w").alias("v2"))
    wedges = e1.join(e2, "u").filter(F.col("v1") < F.col("v2"))
    closing = o.select(
        F.least("u", "w").alias("v1"), F.greatest("u", "w").alias("v2")
    )
    tri = wedges.join(closing, ["v1", "v2"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    base = canon.agg(F.count(F.lit(1)).alias("n_edges"))
    nodes = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        (
            F.sum(F.col("deg").cast("decimal(38,0)") * (F.col("deg") - 1)) / 2
        ).cast("long").alias("n_wedges"),
    )
    j = tri.crossJoin(F.broadcast(base)).crossJoin(F.broadcast(nodes))
    gcc = F.when(
        F.col("n_wedges") > 0,
        F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"),
    )
    return j.select(
        F.col("n_nodes").cast("long"),
        F.col("n_edges").cast("long"),
        F.col("n_triangles").cast("long"),
        F.col("n_wedges").cast("long"),
        F.round(gcc, round_digits).alias("gcc"),
    )


def adamic_adar_topk(
    df: DataFrame,
    key_col: str,
    node_col: str,
    *,
    top_k: int = 20,
    min_common_keys: int = 1,
    round_digits: int = 6,
) -> DataFrame:
    """Adamic–Adar link prediction over the bipartite (key, node)
    incidence — the classic "which two items will co-occur next"
    score: for every unordered node pair, Σ over shared keys of
    1/ln(key degree), so a pair tied together by many SMALL baskets
    outranks one tied by a single huge basket (the co-occurrence
    signal plain pair counts and lift both miss).

    Returns the ``top_k`` (node_a, node_b, n_common_keys, adamic_adar)
    rows by score (ties broken on the pair ids), pairs seen by
    ≥ ``min_common_keys`` keys.

    Exactness: each key's weight is ``round(1/ln(deg), 9)`` — identical
    IEEE doubles on both engines — summed as DECIMAL(28,9) so the pair
    total is order-insensitive and engine-stable; the final score
    rounds to ``round_digits`` IN DECIMAL (both engines HALF_UP there,
    where double-side rounding of lattice values splits on exact
    half-boundaries).

    Scale shape: the log reduces to DISTINCT (key, node) first; key
    degrees are computed with one map-side-combinable count and joined
    back ON THE KEY (co-partitioned with the pair self-join's shuffle —
    one key-keyed exchange feeds both); degree-1 keys are dropped
    before the self-join (they produce no pairs but would still pay
    join fan-in). Pair fan-out per key is O(deg²) — bounded by basket
    size, not corpus size, on order/session logs. The top-k is a
    TakeOrderedAndProject over the pair aggregate, never a full sort.
    """
    kt = (
        df.select(F.col(key_col).alias("__k"), F.col(node_col).alias("__t"))
        .filter(F.col("__k").isNotNull() & F.col("__t").isNotNull())
        .distinct()
    )
    deg = kt.groupBy("__k").agg(F.count(F.lit(1)).alias("__deg"))
    weighted = (
        kt.join(deg.filter(F.col("__deg") >= 2), "__k")
        .withColumn("__w", F.round(F.lit(1.0) / F.log(F.col("__deg").cast("double")), 9))
    )
    pairs = (
        weighted.alias("x")
        .join(weighted.alias("y"), "__k")
        .filter(F.col("x.__t") < F.col("y.__t"))
        .groupBy(F.col("x.__t").alias("node_a"), F.col("y.__t").alias("node_b"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_common_keys"),
            F.sum(F.col("x.__w").cast("decimal(28,9)")).alias("__aa"),
        )
        .filter(F.col("n_common_keys") >= min_common_keys)
    )
    return (
        pairs.select(
            "node_a",
            "node_b",
            "n_common_keys",
            # round in DECIMAL space: the score is a 1e-9-lattice value, so
            # a double-side round hits exact half-boundaries ~1/1000 per row
            # where the engines disagree (the PageRank lesson above);
            # decimal ROUND is HALF_UP on both.
            F.round(F.col("__aa"), round_digits).cast("double").alias("adamic_adar"),
        )
        .orderBy(F.desc("adamic_adar"), F.asc("node_a"), F.asc("node_b"))
        .limit(top_k)
    )
