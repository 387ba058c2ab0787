"""Scale stress: run the load-bearing operators at 30–300× the driver's
sf0.1 volume and record throughput — the empirical backing for the
100 TB design notes in SCALE.md.

Generates synthetic inputs with the distributed generator (no testdata
mutation), materializes via the no-op sink, prints one JSON line per op.

    python tools/scalecheck.py [--events 20000000] [--docs 200000] [--vecs 200000]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from ml_feature_store_pipeline_spark.extractors import ApproxUserEventExtractor, UserEventExtractor
from ml_feature_store_pipeline_spark.generator import generate_events
from ml_feature_store_pipeline_spark.operators import dedup, joins, sampling, similarity, text, windows
from ml_feature_store_pipeline_spark.operators.pit import FeatureView, training_set
from ml_feature_store_pipeline_spark.session import get_spark

VOCAB = (
    "key agg row scan slow fast table value part hash merge batch window spark "
    "order data column join small line customer query big vector stream group sort filter the a"
).split()


def log(op: str, seconds: float, rows: int) -> None:
    print(
        json.dumps(
            {"op": op, "sec": round(seconds, 2), "rows": rows, "rows_per_sec": int(rows / max(seconds, 1e-9))}
        ),
        flush=True,
    )


def timed(op: str, df, rows: int) -> None:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    log(op, time.time() - t0, rows)


def synth_docs(spark, n: int, tokens_per_doc: int = 60):
    """Bag-of-words docs like the driver's documents table, any size."""
    words = F.array(*[F.lit(w) for w in VOCAB])
    tok = F.transform(
        F.sequence(F.lit(1), F.lit(tokens_per_doc)),
        lambda i: F.element_at(
            words,
            ((F.xxhash64(F.col("id"), i) % len(VOCAB) + len(VOCAB)) % len(VOCAB) + 1).cast("int"),
        ),
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", tok).alias("text")
    )


def synth_vecs(spark, n: int, dim: int = 64):
    # hash-derived uniforms: per-(row, dim) independent, deterministic
    arr = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda i: (F.xxhash64(F.col("id"), i) % 10000).cast("double") / 5000.0 - 1.0,
    )
    return spark.range(n).select(F.col("id").alias("vec_id"), arr.cast("array<float>").alias("embedding"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=20_000_000)
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--vecs", type=int, default=200_000)
    args = ap.parse_args()

    spark = get_spark("scalecheck")
    work = tempfile.mkdtemp(prefix="scalecheck_")
    try:
        # ---- materialize inputs to parquet (so scans are realistic) -------
        t0 = time.time()
        generate_events(spark, n_events=args.events, n_users=max(args.events // 200, 1), seed=42).write.mode(
            "overwrite"
        ).parquet(f"{work}/events")
        log("generate_events_parquet", time.time() - t0, args.events)
        events = spark.read.parquet(f"{work}/events")

        t0 = time.time()
        synth_docs(spark, args.docs).write.mode("overwrite").parquet(f"{work}/docs")
        log("generate_docs_parquet", time.time() - t0, args.docs)
        docs = spark.read.parquet(f"{work}/docs")

        t0 = time.time()
        synth_vecs(spark, args.vecs).write.mode("overwrite").parquet(f"{work}/vecs")
        log("generate_vecs_parquet", time.time() - t0, args.vecs)
        vecs = spark.read.parquet(f"{work}/vecs")

        # ---- the load-bearing operators ----------------------------------
        timed("flagship_extract_exact", UserEventExtractor().extract(events), args.events)
        timed("flagship_extract_approx", ApproxUserEventExtractor().extract(events), args.events)
        timed(
            "sessionize",
            windows.sessionize(events, "user_id", "timestamp", 1800),
            args.events,
        )
        # as-of: each event sees the user's latest prior purchase
        purchases = events.filter(F.col("amount") > 0).select(
            "user_id", F.col("timestamp").alias("p_ts"), F.col("amount").alias("p_amount")
        )
        timed(
            "asof_join",
            joins.asof_join(
                events.select("user_id", "timestamp", "event_type"),
                purchases,
                key="user_id",
                left_ts="timestamp",
                right_ts="p_ts",
                value_cols=["p_amount"],
            ),
            args.events,
        )
        timed(
            "minhash_lsh_pairs",
            dedup.lsh_candidate_pairs(docs, "doc_id", "text", parallelism=spark.sparkContext.defaultParallelism),
            args.docs,
        )
        timed("simhash", dedup.simhash(docs, "doc_id", "text"), args.docs)
        timed(
            "simhash_near_pairs",
            dedup.simhash_near_pairs(docs, "doc_id", "text", max_hamming=3),
            args.docs,
        )
        timed(
            "exact_dedup_digest",
            dedup.exact_dedup(docs, ["text"], "doc_id"),
            args.docs,
        )
        queries = vecs.filter(F.col("vec_id") < 100).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        timed("cosine_topk_100q", similarity.cosine_topk(queries, vecs, k=10), args.vecs * 100)
        # run twice: first pays Python-worker fork + numpy import, second is steady state
        timed("cosine_topk_blas_cold", similarity.cosine_topk_blas(queries, vecs, k=10), args.vecs * 100)
        timed("cosine_topk_blas_warm", similarity.cosine_topk_blas(queries, vecs, k=10), args.vecs * 100)
        timed("chunk_documents", text.chunk_documents(docs, "doc_id", "text", chunk_tokens=32, overlap=8), args.docs)
        timed(
            "deterministic_sample_10pct",
            sampling.deterministic_sample(events, "user_id", 0.10),
            args.events,
        )
        labels = events.filter(F.col("event_type") == "purchase").select("user_id", "timestamp")
        timed(
            "training_set_1view",
            training_set(
                labels,
                {"p": FeatureView(purchases, "p_ts", ["p_amount"])},
                key="user_id",
                label_ts="timestamp",
            ),
            args.events,
        )
        # hot-key stress: EVERY row on one key — the plain as-of serializes
        # this into a single window task; the bucketed form splits it
        hot = events.select(
            F.lit(1).alias("user_id"), F.col("timestamp"), F.col("event_type")
        )
        hot_purch = purchases.withColumn("user_id", F.lit(1))
        timed(
            "asof_join_bucketed_1key",
            joins.asof_join_bucketed(
                hot, hot_purch, key="user_id", left_ts="timestamp", right_ts="p_ts",
                value_cols=["p_amount"], bucket_seconds=3600,
            ),
            args.events,
        )
        timed(
            "ngram_jaccard_capped",
            dedup.ngram_jaccard_pairs(
                docs, "doc_id", "text", threshold=0.3,
                parallelism=spark.sparkContext.defaultParallelism,
            ),
            args.docs,
        )
        tiers = spark.range(2000).select(
            (F.col("id") * 5.0).alias("lo"),
            (F.col("id") * 5.0 + 7.5).alias("hi"),
            F.col("id").alias("tier_id"),
        )
        timed(
            "interval_join_2k_bands",
            joins.interval_join_bucketed(
                events.select("amount"), tiers, "amount", bucket_width=5.0
            ),
            args.events,
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
