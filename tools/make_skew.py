#!/usr/bin/env python
"""Generate a ZIPFIAN-SKEWED variant of an sf directory (round-8 verdict
#3): same tables, same row counts, same schemas — but with the hot-key
structure real 100 TB corpora have and the uniform synthetic data lacks:

- **events**: a hash-chosen ~10% of all events reassigned to ONE user
  (user_id 1) — the celebrity-user key that caps a shuffled groupBy/join
  at 1-task speed unless the operator is skew-aware.
- **documents**: ~5% of docs replaced with EXACT copies of one base text
  (one digest carries 5% of the corpus), and another ~5% with
  lightly-salted variants of the same base (one near-dup cluster of ~5%
  of the corpus — a hot LSH bucket and a giant connected component).
- every other table is copied through unchanged.

Row counts are preserved, so a timing ratio between the uniform source
and this variant isolates the skew effect from data volume.

Usage: python tools/make_skew.py [src_dir] [out_dir]
       (defaults: /root/testdata/sf0.1 -> /tmp/wmb_skew)
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HOT_USER = 1
HOT_DOC_FRAC = 0.05  # per arm: 5% exact copies + 5% near-dup variants


def build_skew(spark, src: str, out: str) -> None:
    ev = spark.read.parquet(f"{src}/events.parquet")
    # deterministic content-hash pick, independent of partition layout
    hot = F.pmod(F.xxhash64("event_id", F.lit(7)), F.lit(10)) == 0
    # match the SOURCE's file count (round 17): the variant must differ
    # from the source only in key distribution — writing fewer files
    # than the source halves the scan parallelism of map-only arms and
    # fakes a ~2x "skew" ratio that is really a layout artifact
    ev.withColumn(
        "user_id", F.when(hot, F.lit(HOT_USER)).otherwise(F.col("user_id"))
    ).repartition(max(8, len(ev.inputFiles()))).write.mode(
        "overwrite"
    ).parquet(f"{out}/events.parquet")

    docs = spark.read.parquet(f"{src}/documents.parquet")
    base = (
        docs.orderBy("doc_id").select("text").first()["text"]
        or "base document text for the planted hot cluster"
    )
    pick = F.pmod(F.xxhash64("doc_id", F.lit(13)), F.lit(100))
    exact_arm = pick < int(HOT_DOC_FRAC * 100)
    near_arm = (pick >= int(HOT_DOC_FRAC * 100)) & (
        pick < int(2 * HOT_DOC_FRAC * 100)
    )
    # near-variants: the shared base plus a tiny per-doc suffix, so their
    # pairwise word-shingle Jaccard stays high (one hot cluster) without
    # being byte-identical (they must survive exact dedup and hit the
    # NEAR-dup path)
    near_text = F.concat(
        F.lit(base), F.lit(" variant token "), F.col("doc_id").cast("string")
    )
    # hot SOURCE (round 10): ~90% of docs reassigned to src0 — the
    # one-source-dominates-the-mix shape that funnels the token-budget
    # cut and the per-source mixing stages onto one group key
    hot_src = F.pmod(F.xxhash64("doc_id", F.lit(29)), F.lit(10)) < 9
    docs.withColumn(
        "text",
        F.when(exact_arm, F.lit(base))
        .when(near_arm, near_text)
        .otherwise(F.col("text")),
    ).withColumn(
        "n_chars", F.length("text").cast("long")
    ).withColumn(
        "source", F.when(hot_src, F.lit("src0")).otherwise(F.col("source"))
    ).repartition(max(8, len(docs.inputFiles()))).write.mode(
        "overwrite"
    ).parquet(f"{out}/documents.parquet")

    # embeddings: one hot EMBEDDING cluster (round 9 — exercises the SRP /
    # semantic star-fallback paths the text arms cannot reach): ~5% of
    # vectors replaced by EXACT copies of one base vector (one hot SRP
    # band bucket in every band + one hot semantic cell), another ~5% by
    # near-copies (tiny deterministic per-dim nudge, cosine ~0.9999 — they
    # survive exact-vector dedup and hit the near-dup path)
    if os.path.exists(f"{src}/embeddings.parquet"):
        emb = spark.read.parquet(f"{src}/embeddings.parquet")
        vbase = (
            emb.orderBy("vec_id").select("embedding").first()["embedding"]
        )
        epick = F.pmod(F.xxhash64("vec_id", F.lit(17)), F.lit(100))
        e_exact = epick < int(HOT_DOC_FRAC * 100)
        e_near = (epick >= int(HOT_DOC_FRAC * 100)) & (
            epick < int(2 * HOT_DOC_FRAC * 100)
        )
        base_lit = F.array(*[F.lit(float(x)).cast("float") for x in vbase])
        near_lit = F.expr(
            "transform(__base, (x, i) -> cast(x + 1e-4 * pmod(vec_id + i, 7) "
            "as float))"
        )
        emb.withColumn("__base", base_lit).withColumn(
            "embedding",
            F.when(e_exact, F.col("__base"))
            .when(e_near, near_lit)
            .otherwise(F.col("embedding")),
        ).drop("__base").repartition(
            max(8, len(emb.inputFiles()))
        ).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")

    for t in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
    ):
        # partial sources (e.g. the sf1 smoke dir holds only the four big
        # tables) copy through what exists; the skew arms above are the
        # point of this tool
        if not os.path.exists(f"{src}/{t}.parquet"):
            continue
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/wmb_skew"
    from woe_monotonic_binning_spark import get_spark

    spark = get_spark(app_name="wmb-make-skew")
    spark.sparkContext.setLogLevel("ERROR")
    build_skew(spark, src, out)
    print(f"skewed variant of {src} written to {out}")
    spark.stop()


if __name__ == "__main__":
    main()
