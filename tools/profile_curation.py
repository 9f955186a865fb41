"""Stage-decomposed profile of the curation flagship (round-13 verdict
item 4: the clean-run headline drifted 6.43s (r10) -> 8.18s (r12) on an
untouched definition; decompose it instead of filing another "in band"
note).

Each cumulative stage prefix runs in a FRESH python process (fresh JVM,
fresh caches — the fresh-process floor that separates host/JVM state from
a genuine stage regression), repeated --reps times, min taken.  Stage
prefixes mirror the bench `run_curation` config exactly (scrub=True,
quality 0.5, MinHash 0.7, the certified mixing weights, test_fraction
0.25, split_seed 11) and the pipeline's own materialization barriers
(scrub persist, survivor cache), so a stage's delta is attributable to
that stage's operators and not to a missing cache.

Usage:
    python tools/profile_curation.py                 # all stages, table
    python tools/profile_curation.py --stage neardup # one stage, inline
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

STAGES = ["read", "scrub", "quality", "exact", "neardup", "full"]
DEFAULT_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def run_stage(stage: str, sf: str) -> float:
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from woe_monotonic_binning_spark import get_spark

    spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=int(CPUS))
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    t0 = time.monotonic()
    if stage == "full":
        from queries_catalog import _CURATION_WEIGHTS

        from woe_monotonic_binning_spark.pipeline import curate_corpus

        labeled = curate_corpus(
            docs,
            scrub=True,
            quality_threshold=0.5,
            near_dup="minhash",
            near_dup_threshold=0.7,
            weights=_CURATION_WEIGHTS,
            test_fraction=0.25,
            split_seed=11,
        )
        labeled.groupBy("split").count().count()
    else:
        from woe_monotonic_binning_spark.operators.text import (
            PII_PATTERNS,
            quality_score,
            scrub_pii,
        )

        if stage != "read":
            docs = scrub_pii(docs, "text").drop(
                *[f"n_{kind}" for kind in PII_PATTERNS]
            ).persist(StorageLevel.MEMORY_AND_DISK)
        if stage in ("quality", "exact", "neardup"):
            docs = quality_score(docs, "text").filter(F.col("quality") >= 0.5)
        if stage in ("exact", "neardup"):
            from woe_monotonic_binning_spark.operators.dedup import (
                exact_dedup_by_digest,
            )

            reps = exact_dedup_by_digest(docs, "text", "doc_id").select("doc_id")
            docs = docs.join(reps, "doc_id", "left_semi")
        if stage == "neardup":
            from woe_monotonic_binning_spark.operators.dedup import (
                dedup_keep_best,
                minhash_dedup_pairs,
            )

            docs = docs.persist()
            pairs = minhash_dedup_pairs(docs, "text", "doc_id", threshold=0.7)
            docs = dedup_keep_best(docs, pairs, "doc_id", "quality", descending=True)
        docs.count()
    dt = time.monotonic() - t0
    spark.catalog.clearCache()
    spark.stop()
    return dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=DEFAULT_SF)
    ap.add_argument("--stage", choices=STAGES)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    if args.stage:
        print(json.dumps({"stage": args.stage, "sec": round(run_stage(args.stage, args.sf), 3)}))
        return
    results: dict[str, float] = {}
    for stage in STAGES:
        times = []
        for _ in range(args.reps):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--stage", stage,
                 "--sf", args.sf],
                capture_output=True, text=True,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
            lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
            if out.returncode != 0 or not lines:
                # surface the child's real diagnostic, not an IndexError
                print(out.stderr[-4000:], file=sys.stderr)
                raise RuntimeError(
                    f"stage {stage!r} child failed (rc={out.returncode})"
                )
            times.append(json.loads(lines[-1])["sec"])
        results[stage] = min(times)
        print(f"{stage:>8}: {results[stage]:7.3f}s  (reps: {times})", file=sys.stderr)
    deltas = {
        s: round(results[s] - results[STAGES[i - 1]], 3) if i else results[s]
        for i, s in enumerate(STAGES)
    }
    print(json.dumps({"sf": args.sf, "cumulative": results, "stage_delta": deltas}))


if __name__ == "__main__":
    main()
