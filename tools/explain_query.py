"""Print the optimized/physical plan for any registry query.

    python tools/explain_query.py tpch_q5_like [sf_dir] [--mode formatted]

Modes: formatted (default), extended, codegen, cost. Use this to check the
scale properties by eye: PushedFilters reaching the scan, pruned
ReadSchema, BroadcastHashJoin vs SortMergeJoin, partial aggregation,
TakeOrderedAndProject, exchange count.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    mode = "formatted"
    for a in sys.argv[1:]:
        if a.startswith("--mode"):
            mode = a.split("=", 1)[1] if "=" in a else "formatted"
    if not args:
        from ml_feature_store_pipeline_spark.harness import query_registry

        print("usage: python tools/explain_query.py <query> [sf_dir] [--mode=formatted]")
        print("queries:", ", ".join(sorted(query_registry())))
        return
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"

    from ml_feature_store_pipeline_spark.harness import query_registry
    from ml_feature_store_pipeline_spark.session import get_spark

    registry = query_registry()
    if name not in registry:
        raise SystemExit(f"unknown query {name!r}; run with no args for the list")
    spark = get_spark("explain")
    df = registry[name](spark, sf_dir)
    df.explain(mode=mode)


if __name__ == "__main__":
    main()
