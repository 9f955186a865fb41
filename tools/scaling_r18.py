"""Round-18 item 5 (VERDICT r17): a scaling-credible arm.

At sf0.1 the whole bench is scheduling-overhead-bound (~20s total), so
8-core vs 32-core ratios sit at ~1 and the driver's `suspect_cpus_ignored`
heuristic fires even though the harness honors $SPARK_GRAFT_CPUS.  This
arm runs the HEAVY headlines at sf1 (10x the rows; regenerate with
`python3 tools/make_sf1.py /tmp/wmb_sf1` — deterministic replication of
the committed sf0.1 inputs) at 8 and 32 cores through the UNMODIFIED
bench harness (SPARK_GRAFT_BENCH_ONLY single-query mode), so parallelism
is expressible and the core count visibly matters.

Usage: python3 tools/scaling_r18.py [sf1_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

QUERIES = ["fit_batch", "transform", "dedup_minhash", "dedup_cc", "curation", "drift"]
CPU_LEVELS = ["32", "8"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/wmb_sf1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "artifacts/scaling_r18_sf1.json"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results: dict = {"sf_dir": sf_dir, "queries": {}, "note": (
        "min-of-3 per cell via bench.py single-query mode; ratio = 8-core / "
        "32-core wall — >1 means more cores genuinely help at this scale"
    )}
    for q in QUERIES:
        row = {}
        for cpus in CPU_LEVELS:
            env = dict(
                os.environ,
                SPARK_GRAFT_SF_DIR=sf_dir,
                SPARK_GRAFT_CPUS=cpus,
                SPARK_GRAFT_BENCH_ONLY=q,
            )
            proc = subprocess.run(
                [sys.executable, os.path.join(repo, "bench.py")],
                env=env, capture_output=True, text=True, timeout=3600, cwd=repo,
            )
            val = None
            for line in reversed(proc.stdout.strip().splitlines()):
                try:
                    val = json.loads(line)["queries"][q]
                    break
                except Exception:
                    continue
            row[f"c{cpus}"] = val
            print(f"{q} @ {cpus} cores: {val}", flush=True)
        if row.get("c8") and row.get("c32"):
            row["ratio_8_over_32"] = round(row["c8"] / row["c32"], 3)
        results["queries"][q] = row
    commit = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=repo, capture_output=True, text=True
    ).stdout.strip()
    if commit:
        results["commit"] = commit
    with open(os.path.join(repo, out_path), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
