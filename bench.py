"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}. Each query is fully materialized
via the no-op sink (computes everything, collects nothing to the driver).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ml_feature_store_pipeline_spark.session import get_spark

#: Headline set: one per operator family — scan-agg, quality profile,
#: star join, heavy join+topk, as-of, window, sessionize, dedup (minhash +
#: jaccard), similarity, text, windowed ingest.
HEADLINE = [
    "user_features",
    "quality_null_dup_stats",
    "tpch_q1",
    "tpch_q3_topk",
    "revenue_by_region",
    "asof_events_orders",
    "running_revenue",
    "sessionize_events",
    "minhash_candidate_pairs",
    "ngram_jaccard_pairs",
    "cosine_topk",
    "text_stats",
    "windowed_user_counts",
    "training_set_pit",
    "tpch_q18_like",
    "cosine_topk_blas",
    "chunk_documents",
    "scrub_pii_docs",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from ml_feature_store_pipeline_spark.harness import query_registry

    registry = query_registry()
    spark = get_spark("bench")

    # warm the JVM/codegen/parquet-reader paths once so class-loading cost
    # doesn't land on the first measured query (region is 5 rows, not a
    # cache of any measured input)
    spark.range(1000).count()
    from ml_feature_store_pipeline_spark.sources.readers import read_table
    read_table(spark, sf_dir, "region").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry[name]
        t0 = time.time()
        materialize(fn(spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
