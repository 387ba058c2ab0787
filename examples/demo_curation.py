"""End-to-end LLM training-corpus curation demo on the sf0.001 test tables:

filter (language + quality + Gopher rules) → LM-perplexity gate → exact
dedup → near-dup survivors → chunk-level dedup → benchmark
decontamination → DSIR target-distribution selection → semantic dedup
over embeddings → sequence packing → token-mix rebalance → MMR-diverse
retrieval spot-check.

Each stage is one of this repo's oracle-verified operators; this script
chains them the way a real data pipeline would. Run:

    python examples/demo_curation.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ml_feature_store_pipeline_spark.operators import dedup, sampling, selection, similarity, text
from ml_feature_store_pipeline_spark.session import get_spark
from ml_feature_store_pipeline_spark.sources.readers import read_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("demo_curation")
    par = spark.sparkContext.defaultParallelism

    docs = read_table(spark, sf_dir, "documents")
    n0 = docs.count()
    print(f"corpus: {n0} docs")

    # 1. language + quality gate
    gated = (
        docs.filter(F.col("lang") == "en")
        .join(
            text.quality_score(docs, "doc_id", "text").filter(F.col("quality_score") >= 0.3).select("doc_id"),
            "doc_id",
        )
        .select("doc_id", "text", "source")
    )
    n1 = gated.count()
    print(f"after language+quality gate: {n1} ({n0 - n1} dropped)")

    # 1b. Gopher rule audit (r7): per-rule booleans; keep the conjunction
    gr = text.gopher_rules(gated, "doc_id", "text", min_words=10, min_stopword_hits=1)
    gated = gated.join(gr.filter(F.col("keep")).select("doc_id"), "doc_id")
    n1b = gated.count()
    print(f"after Gopher rules: {n1b} ({n1 - n1b} dropped)")

    # 2. exact dedup (digest-first: shuffle carries md5, never text);
    # exact_dedup keeps id + content only, so re-attach source afterwards
    exact = dedup.exact_dedup(gated, ["text"], "doc_id").join(
        gated.select("doc_id", "source"), "doc_id"
    )
    n2 = exact.count()
    print(f"after exact dedup: {n2} ({n1 - n2} dropped)")

    # 2b. LM quality gate (CCNet-style): train a char-trigram model on the
    # surviving corpus, drop the worst-perplexity 5% tail
    model = text.char_ngram_model(exact, "text")
    scored = text.lm_score(exact, model, "doc_id", "text")
    cut = scored.agg(F.expr("percentile(xent, 0.95)")).collect()[0][0]
    exact = exact.join(scored.filter(F.col("xent") <= cut).select("doc_id"), "doc_id")
    n2b = exact.count()
    print(f"after LM gate (xent <= {cut:.3f}): {n2b} ({n2 - n2b} dropped)")

    # 3. near-dup survivors (inverted-index Jaccard -> components -> keep min id)
    pairs = dedup.ngram_jaccard_pairs(
        exact, "doc_id", "text", threshold=0.3, parallelism=par
    )
    survivors = dedup.dedup_survivors(exact, pairs, "doc_id")
    n3 = survivors.count()
    print(f"after near-dedup: {n3} ({n2 - n3} dropped)")

    # 3a'. chunk-level dedup (r7): drop repeated 16-token windows
    # corpus-wide, rebuild surviving text per doc
    cd = selection.chunk_dedup(survivors, "doc_id", "text", chunk_tokens=16)
    survivors = (
        survivors.drop("text")
        .join(cd.filter(F.col("n_chunks_kept") > 0), "doc_id")
        .select("doc_id", F.col("clean_text").alias("text"), "source")
    )
    dropped_chunks = cd.agg(F.sum(F.col("n_chunks") - F.col("n_chunks_kept"))).collect()[0][0]
    print(f"chunk dedup: {dropped_chunks} repeated chunks removed; {survivors.count()} docs remain")

    # 3b. benchmark decontamination: drop training docs sharing any 5-gram
    # with the held-out eval slice (every 31st doc plays the benchmark)
    ev = survivors.filter(F.col("doc_id") % 31 == 0)
    tr = survivors.filter(F.col("doc_id") % 31 != 0)
    contaminated = dedup.ngram_overlap_pairs(tr, ev, "doc_id", "text", n=5).select(
        F.col("train_id").alias("doc_id")
    ).distinct()
    survivors = tr.join(contaminated, "doc_id", "left_anti")
    n3b = survivors.count()
    print(f"after decontamination: {n3b} train docs ({contaminated.count()} dropped)")

    # 3b'. passage-grain pass (r9): the n-gram rule misses verbatim runs
    # that straddle tokenization — catch any shared character run >= 37
    # chars against the same eval slice and drop those docs too
    verbatim = dedup.substring_overlap_pairs(
        survivors, ev, "doc_id", "text", passage_len=30, stride=8
    ).select(F.col("train_id").alias("doc_id")).distinct()
    survivors = survivors.join(verbatim, "doc_id", "left_anti")
    # the curated lineage is now ~10 stages deep and every later count /
    # join replays it in full — pin it once (the reused-subtree rule)
    survivors = survivors.localCheckpoint()
    n3c = survivors.count()
    print(f"after passage-level decontamination: {n3c} train docs "
          f"({n3b - n3c} verbatim-run carriers dropped)")

    # 3c. DSIR selection (r7): keep the half of the corpus that looks most
    # like the held-out eval slice (hashed-n-gram importance resampling)
    ratios = selection.dsir_log_ratios(ev, survivors, "text", n_buckets=512)
    k_dsir = max(survivors.count() // 2, 1)
    picked = selection.dsir_sample(survivors, "doc_id", "text", ratios, k=k_dsir, n_buckets=512)
    survivors = survivors.join(picked.select("doc_id"), "doc_id")
    print(f"after DSIR selection (target = eval distribution): {survivors.count()} docs")

    # 4. semantic dedup over the embedding table (SemDeDup, deterministic cells)
    emb = read_table(spark, sf_dir, "embeddings")
    sem_keep = similarity.semantic_dedup(emb, threshold=0.4, n_cells=8)
    print(f"semantic dedup keeps {sem_keep.count()} of {emb.count()} embeddings")

    # 5. sequence packing: fill 512-token training rows
    packed = text.pack_sequences(survivors, "doc_id", "text", token_budget=512, n_groups=par)
    agg = (
        text.pack_stats(packed, 512)
        .agg(F.count(F.lit(1)).alias("n_packs"), F.avg("fill_ratio").alias("mean_fill"))
        .collect()[0]
    )
    print(f"packing: {agg['n_packs']} sequences, mean fill={float(agg['mean_fill']):.2f}")

    # 6. token-mix rebalance across sources (equal token shares)
    weights = {s: 1 for (s,) in survivors.select("source").distinct().collect()}
    mixed = sampling.mixture_sample_by_tokens(
        survivors.withColumn(
            "n_tokens", F.size(F.split(F.trim(F.col("text")), r"\s+"))
        ),
        "doc_id",
        "source",
        weights,
        n_tokens=F.col("n_tokens"),
    )
    print("token mix by source:")
    for r in (
        mixed.groupBy("source").agg(F.sum("n_tokens").alias("tokens")).orderBy("source").collect()
    ):
        print(f"  {r['source']}: {r['tokens']} tokens")

    # 6b. the r10 diagnose→act loop: per-source unigram KL (which source
    # drags the token distribution) becomes the mixture weights — a
    # skewed source is exponentially down-weighted in its TARGET SHARE.
    # Note the sampler's contract carefully: targets are token shares
    # ∝ weight, NOT per-source keep rates — a small-but-skewed source
    # whose target exceeds what it has SATURATES (keeps 100%, marked *
    # below) because the sampler is downsample-only. The loop's
    # guaranteed direction is therefore in the WEIGHTS: monotone
    # decreasing in KL, exactly.
    kl_rows = (
        text.unigram_kl_by_source(survivors, "source", "text")
        .select("source", "kl_vs_corpus")
        .collect()
    )
    kl = {r["source"]: float(r["kl_vs_corpus"]) for r in kl_rows}
    kl_weights = sampling.kl_mixture_weights(kl)
    with_nt = survivors.withColumn(
        "n_tokens", F.size(F.split(F.trim(F.col("text")), r"\s+"))
    )
    totals = {
        r["source"]: r["t"]
        for r in with_nt.groupBy("source").agg(F.sum("n_tokens").alias("t")).collect()
    }
    rebalanced = sampling.mixture_sample_by_tokens(
        with_nt, "doc_id", "source", kl_weights, n_tokens=F.col("n_tokens")
    )
    kept = {
        r["source"]: r["tokens"]
        for r in rebalanced.groupBy("source").agg(F.sum("n_tokens").alias("tokens")).collect()
    }
    print("KL-reweighted token mix (kl -> weight -> kept/total, * = saturated):")
    for s in sorted(kl):
        sat = "*" if kept.get(s, 0) == totals[s] else ""
        print(
            f"  {s}: kl={kl[s]:.4f} w={kl_weights[s]} "
            f"kept={kept.get(s, 0)}/{totals[s]}{sat}"
        )
    ordered = sorted(kl, key=lambda s: (kl[s], s))
    for a, b in zip(ordered, ordered[1:]):
        assert kl_weights[a] >= kl_weights[b], (
            f"KL loop inverted: {a} (kl {kl[a]:.4f}) got weight "
            f"{kl_weights[a]} < {b} (kl {kl[b]:.4f}) {kl_weights[b]}"
        )

    # 7. retrieval spot-check: MMR-diverse top-5 for two query embeddings
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    mmr = similarity.mmr_rerank(queries, emb, k=5, pool=25, lam=0.7)
    print("MMR-diverse top-5 per query (id:relevance):")
    for qid in (0, 1):
        picks = [
            f"{r['vec_id']}:{r['relevance']:.3f}"
            for r in sorted(
                (r for r in mmr.collect() if r["query_id"] == qid),
                key=lambda r: r["mmr_rank"],
            )
        ]
        print(f"  q{qid}: {' '.join(picks)}")


if __name__ == "__main__":
    main()
