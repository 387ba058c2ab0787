"""Automated plan audit: sweep EVERY registry query's physical plan for
scale anti-patterns and emit one JSON line per query plus a summary.

    python tools/plan_audit.py [sf_dir] [query ...]

Checked per plan (on the ANALYZED physical plan, pre-execution):

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
- ``wscg``           — whole-stage-codegen spans (higher is better;
                       0 means everything runs interpreted)

Known, documented exceptions are listed in ALLOW — each entry names the
query and the flag it is allowed to trip, with the reason.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

#: (query, flag) pairs that are intentional, with reasons (audited by hand).
ALLOW: dict[tuple[str, str], str] = {
    ("embedding_near_dup", "cartesian"): "exact=True oracle mode is documented all-pairs; the production path is the sign-LSH bucketed variant",
    ("cosine_topk", "cartesian"): "queries side is small by contract (broadcast); corpus scanned once",
    ("cosine_topk_blas", "cartesian"): "same contract as cosine_topk, Arrow-batched",
    ("lsh_ann_topk", "cartesian"): "recall-vs-exact oracle joins the tiny exact top-k against ANN output",
    ("ml_brp_ann_topk", "cartesian"): "recall oracle, same shape",
}


def audit_one(name: str, df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "query": name,
        "cartesian": plan.count("CartesianProduct"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "python_row": plan.count("BatchEvalPython"),
        "exchanges": plan.count("Exchange") - plan.count("ReusedExchange"),
        "smj": plan.count("SortMergeJoin"),
        "wscg": plan.count("WholeStageCodegen"),
    }


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]

    from ml_feature_store_pipeline_spark.harness import query_registry
    from ml_feature_store_pipeline_spark.session import get_spark

    spark = get_spark("plan_audit")
    registry = query_registry()
    names = only or list(registry)
    bad: list[str] = []
    for name in names:
        try:
            rec = audit_one(name, registry[name](spark, sf_dir))
        except Exception as e:  # noqa: BLE001 — audit must not die mid-sweep
            print(json.dumps({"query": name, "error": str(e)[:200]}), flush=True)
            bad.append(name)
            continue
        flags = [
            k
            for k in ("cartesian", "python_row")
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
