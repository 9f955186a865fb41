"""Stage-decomposed profiles of the round-17 optimization targets.

Breaks the three most expensive non-curation headlines (fit_batch,
transform, dedup_cc) plus drift into their component stages, timing each
with the SAME actions the bench uses (min of --reps, clearCache between
reps, fresh lineage per rep) so a stage delta is attributable.  Run each
group in a fresh process for a clean floor:

    python tools/profile_r17.py fit
    python tools/profile_r17.py transform
    python tools/profile_r17.py cc
    python tools/profile_r17.py drift
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
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    group = sys.argv[1] if len(sys.argv) > 1 else "fit"
    from pyspark.sql import functions as F

    from woe_monotonic_binning_spark import get_spark

    spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=int(CPUS),
                      app_name=f"profile-r17-{group}")
    spark.sparkContext.setLogLevel("ERROR")

    def read_li():
        return spark.read.parquet(f"{SF_DIR}/lineitem.parquet").withColumn(
            "target", (F.col("l_returnflag") == "R").cast("double")
        )

    def read_docs():
        return spark.read.parquet(f"{SF_DIR}/documents.parquet")

    features = ["l_extendedprice", "l_quantity", "l_discount", "l_tax"]
    results: dict[str, float] = {}

    def timed(name, fn, warm=True):
        if warm:
            fn()
        times = []
        for _ in range(REPS):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            fn()
            times.append(time.monotonic() - t0)
        results[name] = round(min(times), 3)
        print(f"  {name}: min={min(times):.3f} all={[round(t, 3) for t in times]}",
              flush=True)

    if group == "fit":
        from woe_monotonic_binning_spark.fit import (
            fit_bins, melt_features, quantize_summary, summarize,
        )

        spark.sparkContext.setJobDescription("fit: melt+summarize")
        timed("melt_summarize", lambda: _noop(
            summarize(melt_features(read_li(), "target", features))))
        spark.sparkContext.setJobDescription("fit: +quantize")
        timed("plus_quantize", lambda: _noop(quantize_summary(
            summarize(melt_features(read_li(), "target", features)), 1024)))
        spark.sparkContext.setJobDescription("fit: full")
        timed("full_fit", lambda: fit_bins(
            read_li(), "target", features, n_threshold=100, max_distinct=1024
        ).cache().count())

    elif group == "transform":
        from woe_monotonic_binning_spark import apply_bins, fit_bins
        from woe_monotonic_binning_spark.transform import (
            _bins_to_pandas, compile_bin_exprs, median_prepass,
        )

        bins_df = fit_bins(read_li(), "target", features, n_threshold=100,
                           max_distinct=1024)
        bins_local = spark.createDataFrame(bins_df.collect(), schema=bins_df.schema)
        specs = compile_bin_exprs(_bins_to_pandas(bins_local), iv_threshold=0.0)
        variables = [v for v, _, _ in specs]
        spark.sparkContext.setJobDescription("transform: median prepass only")
        timed("median_prepass", lambda: median_prepass(
            read_li(), variables, "exact").first())
        med_row = median_prepass(read_li(), variables, "exact").first()
        medians = {v: med_row[v] for v in variables}
        spark.sparkContext.setJobDescription("transform: encode count only")
        timed("encode_count", lambda: apply_bins(
            read_li(), bins_local, keep_columns=["l_orderkey"], iv_threshold=0.0,
            medians=medians).agg(F.count("*")).collect())
        spark.sparkContext.setJobDescription("transform: encode noop (full CASE)")
        timed("encode_noop", lambda: _noop(apply_bins(
            read_li(), bins_local, keep_columns=["l_orderkey"], iv_threshold=0.0,
            medians=medians)))
        spark.sparkContext.setJobDescription("transform: full bench shape")
        timed("full_transform", lambda: apply_bins(
            read_li(), bins_local, keep_columns=["l_orderkey"], iv_threshold=0.0
        ).agg(F.count("*")).collect())

    elif group == "cc":
        from woe_monotonic_binning_spark.operators.dedup import (
            connected_components, dedup_keep_canonical, minhash_dedup_pairs,
        )

        spark.sparkContext.setJobDescription("cc: minhash pairs only")
        timed("pairs", lambda: minhash_dedup_pairs(
            read_docs(), "text", "doc_id", threshold=0.5).count())
        pairs = minhash_dedup_pairs(read_docs(), "text", "doc_id", threshold=0.5)
        pairs_local = pairs.localCheckpoint(eager=True)
        print(f"  n_pairs={pairs_local.count()}", flush=True)
        spark.sparkContext.setJobDescription("cc: components only")
        timed("components", lambda: connected_components(pairs_local).count())
        spark.sparkContext.setJobDescription("cc: full bench shape")
        timed("full_cc", lambda: dedup_keep_canonical(
            read_docs(),
            minhash_dedup_pairs(read_docs(), "text", "doc_id", threshold=0.5),
            "doc_id").count())

    elif group == "minhash":
        from woe_monotonic_binning_spark.operators.dedup import (
            _lsh_candidate_pairs_lazy, jaccard_verify, minhash_dedup_pairs,
            minhash_signatures, shingled,
        )

        def narrow():
            sc = spark.sparkContext
            n = read_docs().select("doc_id", "text")
            if n.rdd.getNumPartitions() < sc.defaultParallelism:
                n = n.repartition(sc.defaultParallelism)
            return n

        spark.sparkContext.setJobDescription("minhash: shingle only")
        timed("shingle", lambda: _noop(shingled(narrow(), "text", "doc_id", 3, "word")))
        spark.sparkContext.setJobDescription("minhash: +signatures")
        timed("signatures", lambda: _noop(minhash_signatures(
            shingled(narrow(), "text", "doc_id", 3, "word"), "doc_id", 64)))

        def cands_only():
            sh = shingled(narrow(), "text", "doc_id", 3, "word").cache()
            sigs = minhash_signatures(sh, "doc_id", 64)
            cands, banded = _lsh_candidate_pairs_lazy(sigs, "doc_id", 64, 16, 1000)
            n = cands.count()
            sh.unpersist(); banded.unpersist()
            return n

        spark.sparkContext.setJobDescription("minhash: +bands+candidates")
        timed("candidates", cands_only)
        spark.sparkContext.setJobDescription("minhash: full bench shape")
        timed("full_minhash", lambda: minhash_dedup_pairs(
            read_docs(), "text", "doc_id", threshold=0.5).count())

    elif group == "drift":
        import pandas as pd

        from woe_monotonic_binning_spark.drift import (
            characteristic_stability, psi_report, psi_summary,
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
        spark.sparkContext.setJobDescription("drift: psi detail+summary")
        timed("psi", lambda: psi_summary(psi_report(
            read_li(), read_li().filter(F.col("l_tax") > 0.04), drift_bins)).count())
        spark.sparkContext.setJobDescription("drift: characteristic")
        timed("characteristic", lambda: characteristic_stability(
            read_li().withColumn("ship_year", F.year("l_shipdate")),
            drift_bins, "target", period_col="ship_year").count())

    print({"group": group, "results": results}, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
