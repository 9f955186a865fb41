"""Capture .explain('formatted') for the round-17 optimization targets.

    python tools/capture_plans_r17.py before|after

Writes plans/r17/<name>_<tag>.txt.  Only LAZY plan shapes are captured
(plan capture must not run jobs); eager pipelines (minhash cleanup=True,
connected_components' iterative rounds) are documented through their lazy
cores instead.
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
OUT_DIR = os.path.join(_REPO, "plans", "r17")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    os.makedirs(OUT_DIR, exist_ok=True)
    from pyspark.sql import functions as F

    from woe_monotonic_binning_spark import apply_bins, fit_bins, get_spark
    from woe_monotonic_binning_spark.plans import formatted_plan

    spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=int(CPUS),
                      app_name=f"plans-r17-{tag}")
    spark.sparkContext.setLogLevel("ERROR")

    def read_li():
        return spark.read.parquet(f"{SF_DIR}/lineitem.parquet").withColumn(
            "target", (F.col("l_returnflag") == "R").cast("double")
        )

    def read_docs():
        return spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def dump(name, df):
        with open(os.path.join(OUT_DIR, f"{name}_{tag}.txt"), "w") as f:
            f.write(formatted_plan(df))
        print(f"wrote {name}_{tag}.txt", flush=True)

    features = ["l_extendedprice", "l_quantity", "l_discount", "l_tax"]

    # fit_batch: the full fit plan (bins table)
    bins = fit_bins(read_li(), "target", features, n_threshold=100,
                    max_distinct=1024)
    dump("fit_batch", bins)

    # transform: the encoded-output plan AND the bench-action (count) plan
    bins_local = spark.createDataFrame(bins.collect(), schema=bins.schema)
    enc = apply_bins(read_li(), bins_local, keep_columns=["l_orderkey"],
                     iv_threshold=0.0)
    dump("transform_full_output", enc)
    dump("transform_count_action", enc.agg(F.count("*")))

    # dedup_minhash: the lazy verified-pair plan (cleanup=False keeps it lazy;
    # the caches referenced are not yet materialized at explain time)
    from woe_monotonic_binning_spark.operators.dedup import minhash_dedup_pairs

    pairs_lazy = minhash_dedup_pairs(read_docs(), "text", "doc_id",
                                     threshold=0.5, cleanup=False)
    dump("dedup_minhash_lazy", pairs_lazy)

    # connected_components round-1: the per-round plan shape (built by hand
    # to match the implementation, since the real loop executes eagerly)
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    edges = (
        pairs.select(F.col("id_a").cast("long").alias("src"),
                     F.col("id_b").cast("long").alias("dst"))
        .union(pairs.select(F.col("id_b").cast("long").alias("src"),
                            F.col("id_a").cast("long").alias("dst")))
    )
    if tag == "before":
        # the pre-session-2 edges additionally paid an eager distinct
        edges = edges.distinct()
    if tag == "before":
        labels0 = (edges.select(F.col("src").alias("id")).distinct()
                   .withColumn("label", F.col("id")))
        nbr_min = (
            edges.join(labels0.withColumnRenamed("id", "src"), "src")
            .groupBy("dst").agg(F.min("label").alias("nbr_min"))
            .withColumnRenamed("dst", "id")
        )
        round1 = labels0.join(nbr_min, "id", "left").select(
            "id", F.least("label", F.coalesce("nbr_min", F.col("label"))).alias("label")
        )
    else:
        round1 = (
            edges.groupBy("dst").agg(F.min("src").alias("__nm"))
            .select(F.col("dst").alias("id"),
                    F.least("dst", "__nm").alias("label"))
        )
    dump("dedup_cc_round1_minstep", round1)

    # banded near-dup cores (round-17 anchor fold): the lazy pair plans of
    # the SimHash pigeonhole core and the SRP-LSH core — the star path's
    # anchor now rides the bucket-size aggregation instead of its own
    # groupBy + join(s)
    from woe_monotonic_binning_spark.operators.dedup import simhash_near_pairs

    dump("simhash_pairs_lazy", simhash_near_pairs(
        read_docs(), "text", "doc_id", max_hamming=3, cleanup=False))

    from woe_monotonic_binning_spark.operators.similarity import (
        srp_threshold_pairs,
    )

    def read_emb():
        return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").withColumn(
            "embedding", F.col("embedding").cast("array<double>")
        )

    dump("srp_pairs_lazy", srp_threshold_pairs(
        read_emb(), "embedding", "vec_id", threshold=0.9, dim=16,
        cleanup=False))

    # drift: one histogram pass (psi expected side)
    import pandas as pd

    from woe_monotonic_binning_spark.drift import psi_report

    drift_bins = pd.DataFrame(
        {
            "variable": ["l_extendedprice"] * 3 + ["l_quantity"] * 3,
            "interval_start_include": [0.0, 20000.0, 40000.0, 0.0, 17.0, 34.0],
            "interval_end_exclude": [20000.0, 40000.0, 60000.0, 17.0, 34.0, 51.0],
            "woe": [-0.3, 0.1, 0.4, -0.2, 0.0, 0.3],
            "iv_components": [0.4, 0.3, 0.3, 0.2, 0.15, 0.15],
        }
    )
    dump("drift_psi_detail", psi_report(
        read_li(), read_li().filter(F.col("l_tax") > 0.04), drift_bins))

    spark.stop()


if __name__ == "__main__":
    main()
