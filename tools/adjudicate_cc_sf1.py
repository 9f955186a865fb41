#!/usr/bin/env python
"""sf1 adjudication for the one oracle DuckDB cannot run at scale
(round-11 sweep): ``q_curation_pipeline``'s recursive-CTE transitive
closure is quadratic in DuckDB (>170 CPU-minutes at sf1 before this
sweep killed it), and its oracle-exact blocked-Jaccard pair CTE is 100x
the sf0.1 pair volume by construction.  Every OTHER stage of the
pipeline (scrub / quality / exact dedup / keep-best / mix / split) is a
SQL-linear expression certified by its own slot in the sf1 sweep — the
only semantics unique to this slot at sf1 is the connected-components
labeling, so that is what this tool certifies:

1. build the realistic sf1 pair set (``minhash_dedup_pairs`` over the
   sf1 documents — the production backend the pipeline docstring names
   as the at-scale swap-in, and the same pair schema);
2. run the engine's ``connected_components`` (min-label + pointer
   jumping);
3. cross-check against a driver-side UNION-FIND over the collected pair
   list — an independent exact algorithm sharing no code with the
   engine path;
4. repeat for the skewed sf1 variant (one planted mega-cluster), where
   the label structure is adversarial.

Prints one JSON line {"metric": "wmb_sf1_cc_adjudication", ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    dirs = sys.argv[1:] or ["/tmp/wmb_sf1", "/tmp/wmb_sf1_skew"]

    from woe_monotonic_binning_spark import get_spark
    from woe_monotonic_binning_spark.operators.dedup import (
        connected_components,
        minhash_dedup_pairs,
    )

    spark = get_spark(app_name="wmb-cc-adjudication")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    for d in dirs:
        t0 = time.time()
        docs = spark.read.parquet(f"{d}/documents.parquet")
        pairs = minhash_dedup_pairs(docs, "text", "doc_id", threshold=0.7)
        pair_rows = [(r.id_a, r.id_b) for r in pairs.select("id_a", "id_b").collect()]
        engine = {
            r.id: r.component for r in connected_components(pairs).collect()
        }

        # independent exact reference: union-find with path compression,
        # then per-set min-id labels (the engine's documented label rule)
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pair_rows:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # root IS the min id: every union parents the larger root under
        # the smaller, so find(x) returns the set's minimum id directly —
        # the engine's documented min-label rule
        ref = {x: find(x) for x in list(parent)}

        n_mismatch = sum(1 for k, v in ref.items() if engine.get(k) != v)
        extra = sorted(set(engine) - set(ref))
        out[d] = {
            "pairs": len(pair_rows),
            "nodes": len(ref),
            "components": len(set(ref.values())),
            "mismatches": n_mismatch,
            "engine_only_nodes": len(extra),
            "ok": n_mismatch == 0 and not extra,
            "sec": round(time.time() - t0, 1),
        }
        print(f"{d}: {out[d]}", flush=True)

    print(
        json.dumps(
            {
                "metric": "wmb_sf1_cc_adjudication",
                "ok": all(v["ok"] for v in out.values()),
                "results": out,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
