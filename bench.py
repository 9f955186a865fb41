#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <scale factor>}

Each headline exercises a different engine pillar:
- fit_batch       distributed WOE fit, 4 features, quantile scale guard
- transform       CASE-chain WOE encoding of the fitted bins
- dedup_digest    exact dedup via sha256 aggregation
- dedup_minhash   MinHash-LSH near-dup pipeline end to end
- sim_search      brute-force cosine top-k (10 queries x corpus)
- text_stats      single-pass corpus statistics + fingerprints
- events_windows  tumbling + session window aggregations
- dedup_cc        near-dup pairs -> connected components -> canonical keep
- tfidf           per-doc top-k TF-IDF keywords (two-level agg + broadcast N)

Methodology: each query is timed $SPARK_GRAFT_BENCH_REPS times (default 3)
and the MINIMUM is reported — the bench host is shared and a transient
spike on another tenant otherwise lands in the recorded number; min-of-N
is the standard steady-state throughput estimator.  Two reuse channels
would make repeat timings fake-fast, and both are closed:
- cached-plan reuse: Spark's cache manager matches CANONICALIZED plans, so
  a persisted intermediate from rep 1 (MinHash bands, winnow posting list)
  silently serves an identical rep-2 plan → `clearCache()` before every
  rep;
- shuffle-stage skip: re-running an action on the SAME DataFrame object
  reuses its shuffle map outputs ("skipped stages") → every rep rebuilds
  its input lineage from a fresh `spark.read`.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from woe_monotonic_binning_spark import apply_bins, fit_bins, get_spark
    from woe_monotonic_binning_spark.operators.dedup import (
        dedup_keep_canonical,
        exact_dedup_by_digest,
        minhash_dedup_pairs,
    )
    from woe_monotonic_binning_spark.operators.text import tfidf_top_terms
    from woe_monotonic_binning_spark.operators.similarity import brute_force_topk
    from woe_monotonic_binning_spark.operators.text import text_stats
    from woe_monotonic_binning_spark.operators.windows import session_agg, tumbling_agg
    from woe_monotonic_binning_spark.sources.tables import load_table

    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus), app_name="wmb-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Fresh-lineage constructors: new RDD graph per call, so repeat reps
    # cannot skip shuffle stages computed by an earlier rep.
    def read_li():
        return spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumn(
            "target", (F.col("l_returnflag") == "R").cast("double")
        )

    def read_docs():
        return spark.read.parquet(f"{sf_dir}/documents.parquet")

    def read_emb():
        return spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
            "embedding", F.col("embedding").cast("array<double>")
        )

    def read_events():
        return load_table(spark, sf_dir, "events")

    features = ["l_extendedprice", "l_quantity", "l_discount", "l_tax"]

    # Warm-up: file listings, whole-stage codegen compilation and the Arrow
    # UDF worker pool are one-time session costs, not engine throughput —
    # run every headline SHAPE once on a tiny slice (compiles the same
    # generated code) so the timed section measures steady state, i.e. what
    # a long-lived cluster session sees per query.
    li, docs, emb, events = read_li(), read_docs(), read_emb(), read_events()
    warm_li = li.limit(2000).cache()
    warm_docs = docs.limit(64).cache()
    warm_b = fit_bins(warm_li, "target", features, n_threshold=50)
    apply_bins(warm_li, warm_b, iv_threshold=0.0).count()
    exact_dedup_by_digest(warm_docs, "text", "doc_id").count()
    warm_pairs = minhash_dedup_pairs(warm_docs, "text", "doc_id", threshold=0.5)
    dedup_keep_canonical(warm_docs, warm_pairs, "doc_id").count()
    tfidf_top_terms(warm_docs).count()
    brute_force_topk(
        emb.limit(64), emb.filter(F.col("vec_id") < 2), k=2
    ).count()
    text_stats(warm_docs).agg(F.count("*")).collect()
    ev_warm = events.limit(256).cache()
    tumbling_agg(ev_warm).count()
    session_agg(ev_warm).count()
    warm_li.unpersist(), warm_docs.unpersist(), ev_warm.unpersist()
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    spreads: dict[str, float] = {}

    def timed(name, fn):
        times: list[float] = []
        out = None
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.time()
            out = fn()
            times.append(time.time() - t0)
        times.sort()
        timings[name] = round(times[0], 3)
        medians[name] = round(times[len(times) // 2], 3)
        # worst/best ratio: the per-query noise band on this host.  Two
        # rounds of 26-57% swings on untouched code made single-run numbers
        # unattributable (VERDICT r4); recording the spread in the artifact
        # lets a reader separate host noise from real regressions.
        spreads[name] = round(times[-1] / times[0], 3)
        return out

    def run_fit():
        b = fit_bins(read_li(), "target", features, n_threshold=100, max_distinct=1024)
        b.cache().count()
        return b

    bins_df = timed("fit_batch", run_fit)
    # Local-relation copy of the (tiny) bins table: immune to the per-rep
    # clearCache, so the transform timing measures encoding, not a refit.
    bins_local = spark.createDataFrame(bins_df.collect(), schema=bins_df.schema)
    timed(
        "transform",
        lambda: apply_bins(read_li(), bins_local, keep_columns=["l_orderkey"], iv_threshold=0.0)
        .agg(F.count("*"))
        .collect(),
    )
    timed(
        "dedup_digest",
        lambda: exact_dedup_by_digest(read_docs(), "text", "doc_id").count(),
    )
    timed(
        "dedup_minhash",
        lambda: minhash_dedup_pairs(read_docs(), "text", "doc_id", threshold=0.5).count(),
    )
    timed(
        "sim_search",
        lambda: (lambda e: brute_force_topk(e, e.filter(F.col("vec_id") < 10), k=10).count())(
            read_emb()
        ),
    )
    timed(
        "text_stats",
        lambda: text_stats(read_docs())
        .groupBy("lang")
        .agg(F.count("*"), F.avg("stat_words"), F.avg("stat_punct_ratio"))
        .collect(),
    )
    timed(
        "events_windows",
        lambda: (lambda ev: (tumbling_agg(ev).count(), session_agg(ev).count()))(
            read_events()
        ),
    )

    def run_dedup_cc():
        docs = read_docs()
        pairs = minhash_dedup_pairs(docs, "text", "doc_id", threshold=0.5)
        return dedup_keep_canonical(docs, pairs, "doc_id").count()

    timed("dedup_cc", run_dedup_cc)
    timed("tfidf", lambda: tfidf_top_terms(read_docs()).count())

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "wmb_spark_headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_median": medians,
                "rep_spread": spreads,
                "reps": reps,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
