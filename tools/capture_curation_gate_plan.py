"""Capture .explain('formatted') of curate_corpus's LAZY gate leg
(scrub -> quality gate -> exact-dedup survivors) for the round-17 barrier
change.

    python tools/capture_curation_gate_plan.py before|after

Uses near_dup=None + cache_survivors=False so the whole pipeline stays a
single lazy plan (plan capture must not run jobs) — exactly the
configuration where the former scrub-text persist did NOT apply, i.e. the
configuration that paid the regex re-inlining blow-up before round 17.
The barrier evidence to read in the after file: ONE 5-regex
regexp_replace chain feeding a ``Generate explode`` node, with every
consumer above it (quality signals, the gate filter, the digest) holding
plain attribute references; the before file shows the chain substituted
into the pushed-down Filter predicate and re-inlined into each consumer.
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
    tag = sys.argv[1] if len(sys.argv) > 1 else "after"
    os.makedirs(OUT_DIR, exist_ok=True)

    from woe_monotonic_binning_spark import get_spark
    from woe_monotonic_binning_spark.pipeline import curate_corpus
    from woe_monotonic_binning_spark.plans import formatted_plan

    spark = get_spark(
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        app_name=f"plans-r17-curation-{tag}",
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = curate_corpus(
        docs,
        scrub=True,
        near_dup=None,
        cache_survivors=False,
        test_fraction=0.0,
    )
    path = os.path.join(OUT_DIR, f"curation_gate_lazy_{tag}.txt")
    with open(path, "w") as f:
        f.write(formatted_plan(out))
    print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
