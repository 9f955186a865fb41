#!/usr/bin/env python
"""Generate a one-off ~sf1 dataset (10x sf0.1) for the scale smoke
(round-7 verdict #8): the first empirical data point beyond sf0.1 for the
100x plan-audit claims.

Each table is 10 replicas of the sf0.1 table with replica-salted keys.
Two properties matter for representativeness:

- **lineitem**: keys shift per replica (orderkey*10+i) and prices perturb
  slightly so per-value group counts grow ~10x without becoming exact
  copies — the fit's distinct-value histogram widens like real data.
- **documents**: intra-replica duplicate structure is PRESERVED (docs
  sharing text still share it within a replica), while cross-replica
  copies are pushed below near-dup thresholds by replacing the frequent
  stopwords with replica-salted tokens (changes a large fraction of the
  word shingles, so MinHash/Jaccard do not see 10 trivial variants of
  every doc) — the dup/near-dup RATE stays comparable to sf0.1 instead
  of collapsing 90% of the corpus.

Usage: python tools/make_sf1.py [out_dir]   (default /tmp/wmb_sf1)
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/wmb_sf1"
    from woe_monotonic_binning_spark import get_spark

    spark = get_spark(app_name="wmb-make-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    rep = F.explode(F.sequence(F.lit(0), F.lit(9))).alias("__rep")

    li = spark.read.parquet(f"{SRC}/lineitem.parquet").select("*", rep)
    li = (
        li.withColumn("l_orderkey", F.col("l_orderkey") * 10 + F.col("__rep"))
        .withColumn(
            "l_extendedprice",
            F.round(F.col("l_extendedprice") * (1 + F.col("__rep") / 1000.0), 2),
        )
        .drop("__rep")
    )
    li.repartition(32).write.mode("overwrite").parquet(f"{out}/lineitem.parquet")

    docs = spark.read.parquet(f"{SRC}/documents.parquet").select("*", rep)
    docs = (
        docs.withColumn("doc_id", F.col("doc_id") * 10 + F.col("__rep"))
        .withColumn(
            "text",
            F.regexp_replace(
                F.col("text"),
                r"\b(the|and|of|to|a|in|is)\b",
                F.concat(F.lit("w"), F.col("__rep").cast("string")),
            ),
        )
        .drop("__rep")
    )
    docs.repartition(16).write.mode("overwrite").parquet(f"{out}/documents.parquet")

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet").select("*", rep)
    emb = (
        emb.withColumn("vec_id", F.col("vec_id") * 10 + F.col("__rep"))
        .withColumn(
            "embedding",
            F.expr(
                "transform(embedding, x -> cast(x * (1 + __rep / 200.0) as float))"
            ),
        )
        .drop("__rep")
    )
    emb.repartition(8).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")

    ev = spark.read.parquet(f"{SRC}/events.parquet")
    idc = next(c for c in ev.columns if c.endswith("_id") or c == "user")
    ev = ev.select("*", rep)
    ev = ev.withColumn(idc, F.col(idc) * 10 + F.col("__rep")).drop("__rep")
    ev.repartition(16).write.mode("overwrite").parquet(f"{out}/events.parquet")

    # orders scale WITH lineitem and keep the same key formula, so the
    # l_orderkey <-> o_orderkey FK survives the replication (the sf1
    # oracle sweep runs join queries); customer keys are untouched so the
    # copied-through customer dim still resolves
    od = spark.read.parquet(f"{SRC}/orders.parquet").select("*", rep)
    od = od.withColumn("o_orderkey", F.col("o_orderkey") * 10 + F.col("__rep")).drop(
        "__rep"
    )
    od.repartition(16).write.mode("overwrite").parquet(f"{out}/orders.parquet")

    # dimension tables copy through unchanged: facts scale 10x, dims stay
    # (the realistic shape, and every FK in the replicated facts that
    # references a dim key is untouched by the replication)
    for t in ("region", "nation", "customer", "supplier", "part"):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )

    for t in ("lineitem", "orders", "documents", "embeddings", "events"):
        n = spark.read.parquet(f"{out}/{t}.parquet").count()
        print(f"{t}: {n}")
    spark.stop()


if __name__ == "__main__":
    main()
