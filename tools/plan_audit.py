"""Automated plan audit: sweep EVERY registry query's physical plan for
scale anti-patterns and emit one JSON line per query plus a summary.

    python tools/plan_audit.py [sf_dir] [query ...]

Each query is EXECUTED (collect at the audit SF) so the plan inspected is
the FINAL adaptive plan — on the pre-execution plan AQE hides everything
behind an unresolved ``AdaptiveSparkPlan`` and whole-stage-codegen counts
read 0 for every query (r4 verdict: the metric was vacuous). Checked per
final plan:

- ``cartesian``      — CartesianProduct nodes (never acceptable; broadcast
                       nested-loop against a literal/one-row frame is fine
                       and counted separately as ``bnlj``)
- ``python_row``     — BatchEvalPython = row-at-a-time Python UDF in the
                       plan (the slow path; Arrow forms show as
                       ArrowEvalPython / FlatMapGroupsInPandas / MapInPandas
                       and are allowed where declared)
- ``exchanges``      — shuffle count (informational; joins/aggs need them,
                       but a count that jumps between rounds is a smell)
- ``smj``            — sort-merge joins (fine for fact-fact; a dim join
                       appearing here means a broadcast was missed)
- ``wscg``           — distinct whole-stage-codegen spans (the ``*(n)``
                       markers in the final plan; higher is better, 0 now
                       really does mean everything runs interpreted)
- ``window_1part``   — Window operators whose subtree shuffles through an
                       ``Exchange SinglePartition``: the WHOLE input
                       serializes onto one task. Dim-sized frames are
                       documented exceptions (ALLOW); anything fact-sized
                       here is a scale-killer. (Global scalar aggregates
                       also use a single-partition exchange but only move
                       partial-agg rows — those are not flagged.)

Known, documented exceptions are listed in ALLOW — each entry names the
query and the flag it is allowed to trip, with the reason.
"""

from __future__ import annotations

import json
import re
import sys

sys.path.insert(0, ".")

#: (query, flag) pairs that are intentional, with reasons (audited by hand).
#: NOTE: the r4 cartesian allowances (cosine_topk, embedding_near_dup, the
#: ANN recall oracles) are gone — on the EXECUTED plan every one of those
#: all-pairs joins resolves to a BroadcastNestedLoopJoin against the
#: documented small side (counted as ``bnlj``, informational); an actual
#: CartesianProduct appearing anywhere now fails the sweep.
ALLOW: dict[tuple[str, str], str] = {
    ("hist_quantile_prices", "window_1part"): "cumulative count over the n_bins-row histogram table (constant-sized by construction)",
    ("key_skew_gini_events", "window_1part"): "cumulative multiplicity over the count-of-counts table (|distinct count values| rows — the operator exists to avoid the |keys| rank this replaces; plan-shape-tested)",
    ("event_value_mutual_info", "window_1part"): "marginal/total windows over the |cats|x bins contingency table (<= 50 cells by construction)",
    ("daily_anomaly_profile_events", "window_1part"): "trailing-baseline frame over the day-grain table (|days| rows by construction)",
    ("ks_value_drift_halves", "window_1part"): "CDF cumulative windows over the fixed bins-row table (1000 rows by construction)",
    ("copurchase_degree_profile", "window_1part"): "same count-of-counts fold as key_skew_gini_events, over the degree distribution's distinct values",
    ("survival_curve_users", "window_1part"): "risk-set and KM-product cumulative windows over the |distinct durations| table (bounded by the corpus day span; the fact table reduces in the per-key span aggregate first)",
    ("cusum_daily_value", "window_1part"): "day-index, deviation-cumsum, and running-min windows over the |days| table (the fact table reduces in the day-grain aggregate first)",
    ("best_split_daily_value", "window_1part"): "day-index and prefix-moment windows over the |days| table (the fact table reduces in the day-grain aggregate first — same class as cusum_daily_value)",
    ("isotonic_calibration_embeddings", "window_1part"): "prefix sums over the n_bins-row reliability table (constant-sized by construction — the hist_quantile_prices class)",
    ("forecast_backtest_daily_value", "window_1part"): "the seasonal-naive lag window over the |days| table (the fact table reduces in the day-grain Holt pass first — the cusum class)",
}


def _final_plan(plan: str) -> str:
    """Slice the executed-plan string to the final adaptive plan (the full
    string repeats the initial plan below it, which would double-count)."""
    return plan.split("== Initial Plan ==")[0]


_TREE_ART = re.compile(r"^[\s:+|-]*")


def _depth(line: str) -> int:
    """Tree depth proxy: column where the operator name starts."""
    return len(_TREE_ART.match(line).group(0))


def _single_partition_windows(plan: str) -> int:
    """Count Window operators whose own subtree contains an
    ``Exchange SinglePartition`` (i.e. the window's required distribution
    is all-rows-on-one-task). Subtree = subsequent lines strictly deeper
    than the Window line, ending at the first line at or above its depth."""
    lines = plan.splitlines()
    hits = 0
    for i, line in enumerate(lines):
        op = _TREE_ART.sub("", line)
        if not (op.startswith("Window ") or op.startswith("WindowGroupLimit ")):
            continue
        d = _depth(line)
        for nxt in lines[i + 1 :]:
            if nxt.strip() and _depth(nxt) <= d:
                break
            body = _TREE_ART.sub("", nxt)
            # ENSURE_REQUIREMENTS = Spark inserted it to satisfy the
            # window's required distribution (all rows, one task). An
            # explicit repartitionByRange(1, …) on a small dim prints
            # REPARTITION_BY_NUM and is the caller's sized choice.
            if body.startswith("Exchange SinglePartition, ENSURE_REQUIREMENTS"):
                hits += 1
                break
            # a partitioned exchange below the window satisfies its
            # distribution — stop at the first exchange either way
            if body.startswith("Exchange "):
                break
    return hits


_WSCG_ID = re.compile(r"\*\((\d+)\)")


def audit_one(name: str, df, *, execute: bool = True, pin_plans: list[str] | None = None) -> dict:
    """Audit a query's FINAL executed plan plus any PRE-PIN builder plans.

    ``pin_plans``: executed-plan strings captured by
    ``functions._PIN_PLAN_SINK`` while the query function built its
    pinned frames (pin_local / pin_concurrent). Pinning replaces those
    subtrees with LocalRelations, so without this the audited final plan
    would no longer contain the route builds at all (r10 ADVICE: the
    exchanges drop on lsh_ann_topk/pq_ann_topk reflected removed
    VISIBILITY, not only removed work) — a scale anti-pattern inside a
    pinned builder must still flag on the owning query.
    """
    if execute:
        df.collect()  # drives AQE to the final plan; audit SF is small
    plans = [_final_plan(p) for p in (pin_plans or [])]
    plan = _final_plan(df._jdf.queryExecution().executedPlan().toString())
    plans.append(plan)
    return {
        "query": name,
        "final": "isFinalPlan=true" in plan or "AdaptiveSparkPlan" not in plan,
        "pin_plans": len(plans) - 1,
        "cartesian": sum(p.count("CartesianProduct") for p in plans),
        "bnlj": sum(p.count("BroadcastNestedLoopJoin") for p in plans),
        "python_row": sum(p.count("BatchEvalPython") for p in plans),
        "exchanges": sum(p.count("Exchange") - p.count("ReusedExchange") for p in plans),
        "smj": sum(p.count("SortMergeJoin") for p in plans),
        "wscg": len({(i, m) for i, p in enumerate(plans) for m in _WSCG_ID.findall(p)}),
        "window_1part": sum(_single_partition_windows(p) for p in plans),
    }


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]

    import ml_feature_store_pipeline_spark.functions as _fx
    from ml_feature_store_pipeline_spark.harness import query_registry
    from ml_feature_store_pipeline_spark.session import get_spark

    spark = get_spark("plan_audit")
    registry = query_registry()
    names = only or list(registry)
    bad: list[str] = []
    # capture executed builder plans behind pin_local/pin_concurrent so
    # pinned subtrees stay inside the sweep (see audit_one)
    _fx._PIN_PLAN_SINK = sink = []
    for name in names:
        try:
            sink.clear()
            df = registry[name](spark, sf_dir)
            rec = audit_one(name, df, pin_plans=list(sink))
        except Exception as e:  # noqa: BLE001 — audit must not die mid-sweep
            print(json.dumps({"query": name, "error": str(e)[:200]}), flush=True)
            bad.append(name)
            continue
        flags = [
            k
            for k in ("cartesian", "python_row", "window_1part")
            if rec[k] > 0 and (name, k) not in ALLOW
        ]
        rec["flags"] = flags
        print(json.dumps(rec), flush=True)
        if flags:
            bad.append(name)
    print(
        json.dumps(
            {"summary": True, "queries": len(names), "flagged": bad},
        ),
        flush=True,
    )
    if bad:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
