"""In-process A/B for the round-17 session-2 optimizations.

Reconstructs the OLD shape of each changed operator inline and times old
vs new interleaved in ONE session (same JVM, same host state), min-of-N
per variant — the decision protocol from OPTIMIZATION_r17.md's
"Measurement notes".

    python tools/ab_r17b.py cc      # connected_components edge distinct
    python tools/ab_r17b.py drift   # fused two-population histogram
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = int(os.environ.get("AB_REPS", "4"))


def main() -> None:
    group = sys.argv[1] if len(sys.argv) > 1 else "cc"
    from pyspark.sql import functions as F

    from woe_monotonic_binning_spark import get_spark

    spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=int(CPUS),
                      app_name=f"ab-r17b-{group}")
    spark.sparkContext.setLogLevel("ERROR")

    def read_docs():
        return spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def read_li():
        return spark.read.parquet(f"{SF_DIR}/lineitem.parquet").withColumn(
            "target", (F.col("l_returnflag") == "R").cast("double")
        )

    def bench(label, fn, warm=True):
        if warm:
            fn()
        times = []
        for _ in range(REPS):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            fn()
            times.append(time.monotonic() - t0)
        print(f"{label}: min {min(times):.3f}  all {[round(t, 3) for t in times]}",
              flush=True)
        return min(times)

    if group == "cc":
        from woe_monotonic_binning_spark.operators.dedup import (
            connected_components,
            dedup_assign_components,
            minhash_dedup_pairs,
        )

        # OLD connected_components differed only in the eager edge
        # distinct; reconstruct it by wrapping: distinct the symmetrized
        # union the way the old edges construction did, then hand the
        # (already-symmetric, distinct) edge set to the current CC.  To
        # keep the comparison honest the old variant replicates the old
        # plan exactly: distinct(union) feeding round 1.
        def old_cc(pairs):
            sym = pairs.select(
                F.col("id_a").alias("x"), F.col("id_b").alias("y")
            ).union(
                pairs.select(F.col("id_b").alias("x"), F.col("id_a").alias("y"))
            ).distinct()
            # re-present as one-directional pairs so the inner CC's own
            # union rebuilds the same symmetric set (each directed edge
            # appears once after its distinct-less union: sym holds both
            # directions, CC's union doubles them -> duplicates; that is
            # NOT the old plan).  So instead: call CC on the distinct
            # HALF (x<y), which after CC's symmetrizing union is exactly
            # the old edge table.
            half = sym.filter(F.col("x") < F.col("y")).select(
                F.col("x").alias("id_a"), F.col("y").alias("id_b")
            )
            return connected_components(half)

        def run(cc_fn):
            docs = read_docs()
            pairs = minhash_dedup_pairs(docs, "text", "doc_id", threshold=0.5)
            cc = cc_fn(pairs).withColumnRenamed("id", "doc_id")
            out = docs.join(cc, "doc_id", "left").withColumn(
                "component", F.coalesce("component", F.col("doc_id").cast("long"))
            ).filter(F.col("doc_id").cast("long") == F.col("component"))
            return out.count()

        # interleave variants
        for i in range(2):
            bench(f"old distinct-edges (pass {i})", lambda: run(old_cc), warm=(i == 0))
            bench(f"new no-distinct   (pass {i})", lambda: run(connected_components), warm=(i == 0))

    elif group == "drift":
        import pandas as pd

        from woe_monotonic_binning_spark.drift import (
            _bucket_label,
            _fractions,
            _psi_component,
            _scaffold,
            bin_histogram,
            compile_bin_exprs,
            _bins_to_pandas,
            psi_report,
            psi_summary,
        )

        drift_bins = pd.DataFrame(
            {
                "variable": ["l_extendedprice"] * 3 + ["l_quantity"] * 3,
                "interval_start_include": [0.0, 20000.0, 40000.0, 0.0, 17.0, 34.0],
                "interval_end_exclude": [20000.0, 40000.0, 60000.0, 17.0, 34.0, 51.0],
                "woe": [-0.3, 0.1, 0.4, -0.2, 0.0, 0.3],
                "iv_components": [0.4, 0.3, 0.3, 0.2, 0.15, 0.15],
            }
        )

        def old_detail(expected, actual, specs, min_frac=1e-4):
            scaffold = _scaffold(expected.sparkSession, specs)
            e = _fractions(bin_histogram(expected, specs), scaffold, "expected")
            a = _fractions(bin_histogram(actual, specs), scaffold, "actual").select(
                "variable", "bin", "actual_count", "actual_frac"
            )
            return e.join(a, ["variable", "bin"]).select(
                "variable", "bin", _bucket_label().alias("bucket"),
                "interval_lo", "interval_hi",
                "expected_count", "actual_count",
                "expected_frac", "actual_frac",
                _psi_component(
                    F.col("expected_frac"), F.col("actual_frac"), 1e-4
                ).alias("psi_component"),
            )

        specs = compile_bin_exprs(_bins_to_pandas(drift_bins), 0.02, 2, True)

        def run_old():
            detail = old_detail(read_li(), read_li().filter(F.col("l_tax") > 0.04), specs)
            return psi_summary(detail).count()

        def run_new():
            detail = psi_report(read_li(), read_li().filter(F.col("l_tax") > 0.04), drift_bins)
            return psi_summary(detail).count()

        # value parity first
        new_rows = sorted(map(tuple, psi_report(
            read_li(), read_li().filter(F.col("l_tax") > 0.04), drift_bins
        ).collect()))
        old_rows = sorted(map(tuple, old_detail(
            read_li(), read_li().filter(F.col("l_tax") > 0.04), specs
        ).collect()))
        assert new_rows == old_rows, "psi detail diverged!"
        print(f"value parity OK over {len(new_rows)} rows", flush=True)

        for i in range(2):
            bench(f"old two-pass (pass {i})", run_old, warm=(i == 0))
            bench(f"new fused    (pass {i})", run_new, warm=(i == 0))

    spark.stop()


if __name__ == "__main__" and sys.argv[1:2] != ["decontam"]:
    main()


def _decontam_ab() -> None:
    """old persist-shape vs new barrier-shape contamination_overlap."""
    import time

    from pyspark.sql import functions as F

    from woe_monotonic_binning_spark import get_spark
    from woe_monotonic_binning_spark.operators.dedup import (
        contamination_overlap,
        shingled,
    )
    from woe_monotonic_binning_spark._cache import materialize_and_release

    spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=int(CPUS),
                      app_name="ab-r17b-decontam")
    spark.sparkContext.setLogLevel("ERROR")

    def read_docs():
        return spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def old_overlap(corpus, benchmark, n=8, min_shared=1):
        bench_sh = shingled(benchmark, "text", "doc_id", n=n).persist()
        bench_grams = bench_sh.select(F.explode("shingles").alias("gram")).distinct()
        corpus_sh = shingled(corpus, "text", "doc_id", n=n).persist()
        corpus_grams = corpus_sh.select(F.col("doc_id"), F.explode("shingles").alias("gram"))
        out = (
            corpus_grams.join(F.broadcast(bench_grams), "gram")
            .groupBy("doc_id").agg(F.count("*").alias("n_shared"))
            .filter(F.col("n_shared") >= min_shared)
        )
        return materialize_and_release(out, bench_sh, corpus_sh)

    def run_old():
        docs = read_docs()
        bench = docs.filter(F.col("doc_id") % 25 == 0)
        flagged = old_overlap(docs, bench).select("doc_id")
        return docs.join(flagged, "doc_id", "left_anti").count()

    def run_new():
        from woe_monotonic_binning_spark.operators.dedup import decontaminate
        docs = read_docs()
        bench = docs.filter(F.col("doc_id") % 25 == 0)
        return decontaminate(docs, bench, n=8).count()

    n_old, n_new = run_old(), run_new()
    assert n_old == n_new, (n_old, n_new)
    print(f"value parity OK: {n_new} survivors both ways", flush=True)

    def bench_fn(label, fn):
        times = []
        for _ in range(REPS):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            fn()
            times.append(time.monotonic() - t0)
        print(f"{label}: min {min(times):.3f}  all {[round(t,3) for t in times]}", flush=True)

    for i in range(2):
        bench_fn(f"old persist (pass {i})", run_old)
        bench_fn(f"new barrier (pass {i})", run_new)
    spark.stop()


if __name__ == "__main__" and sys.argv[1:2] == ["decontam"]:
    _decontam_ab()
