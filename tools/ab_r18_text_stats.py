"""Round-18 item 6 (VERDICT r17 "What's wrong" #3): same-window
interleaved A/B of the round-17 `regexp_count` match counters vs the old
`size(regexp_extract_all(...))` form, at the exact bench action shape.

The driver's BENCH_r17 showed text_stats 0.425 -> 0.521 s (0.82x) after
e6aca87 while the builder's A/B showed the opposite sign; this re-pins the
question with both variants timed alternately in ONE process so host state
cancels.  Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python3 tools/ab_r18_text_stats.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from woe_monotonic_binning_spark import get_spark
from woe_monotonic_binning_spark.operators.text import (
    _WORD_RE,
    _BPE_RE,
    WS_CHARS,
    fingerprint,
    punct_ratio,
    space_ratio,
    text_stats,
)


def text_stats_old(df, text_col="text"):
    """text_stats with the PRE-e6aca87 counters, reconstructed verbatim:
    size(regexp_extract_all(...)) with the empty-string size()==-1 edge
    mapped to 0 the way the old expression did via greatest."""
    t = F.col(text_col)

    def old_count(col, pattern):
        return F.greatest(
            F.size(F.regexp_extract_all(col, F.lit(pattern), 0)), F.lit(0)
        )

    return df.select(
        "*",
        F.length(t).alias("stat_chars"),
        old_count(t, _WORD_RE).alias("stat_words"),
        old_count(t, _BPE_RE).alias("stat_tokens"),
        F.round(punct_ratio(t), 6).alias("stat_punct_ratio"),
        F.round(space_ratio(t), 6).alias("stat_space_ratio"),
        fingerprint(t).alias("stat_fingerprint"),
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reps = int(os.environ.get("AB_REPS", "5"))
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus), app_name="ab-text-stats")
    spark.sparkContext.setLogLevel("ERROR")

    def read_docs():
        return spark.read.parquet(f"{sf_dir}/documents.parquet")

    def action(stats_fn):
        return (
            stats_fn(read_docs())
            .groupBy("lang")
            .agg(F.count("*"), F.avg("stat_words"), F.avg("stat_punct_ratio"))
            .collect()
        )

    # value parity first (counts must be identical by definition)
    new_rows = sorted(map(tuple, action(text_stats)))
    old_rows = sorted(map(tuple, action(text_stats_old)))
    assert new_rows == old_rows, "count parity violated!"

    # warm both shapes, then interleave
    action(text_stats)
    action(text_stats_old)
    times = {"regexp_count": [], "size_extract_all": []}
    for _ in range(reps):
        for name, fn in (("regexp_count", text_stats), ("size_extract_all", text_stats_old)):
            spark.catalog.clearCache()
            t0 = time.time()
            action(fn)
            times[name].append(round(time.time() - t0, 3))
    out = {
        name: {"samples": ts, "min": min(ts), "median": sorted(ts)[len(ts) // 2]}
        for name, ts in times.items()
    }
    out["sf_dir"] = sf_dir
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
