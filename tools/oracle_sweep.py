#!/usr/bin/env python
"""sf1 oracle sweep (round-9 verdict #3, carried to round 11): re-run
every oracle-backed catalog compare — the same row-count + schema +
order-insensitive value comparison the driver certifies at sf0.01 — on a
~sf1 dataset (tools/make_sf1.py), so the certified semantics are
validated one decade of scale past the certification point.

Differences from the driver harness, all mechanical:
- the sf1 tables are Spark-written DIRECTORIES, so the DuckDB views glob
  '<table>.parquet/*.parquet';
- each compare is timed and any failure/exception is recorded per query
  instead of aborting the sweep;
- SPARK_GRAFT_SWEEP_ONLY=<q1,q2> filters, SPARK_GRAFT_SWEEP_SKIP skips
  (for oracles whose DuckDB cost is super-linear at sf1 — e.g. a
  recursive-CTE transitive closure — adjudicate those separately and
  record why).

Usage: python tools/oracle_sweep.py [sf_dir]   (default /tmp/wmb_sf1)
Prints one JSON line {"metric": "wmb_sf1_oracle_sweep", ...} at the end.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/wmb_sf1"

    import duckdb

    import __spark_entry__ as entry
    from tests.oracle_harness import TABLES, compare
    from woe_monotonic_binning_spark import get_spark

    qs, osql = entry.queries(), entry.oracle_sql()
    names = sorted(osql)
    only = os.environ.get("SPARK_GRAFT_SWEEP_ONLY")
    if only:
        keep = {s.strip() for s in only.split(",") if s.strip()}
        unknown = keep - set(names)
        if unknown:
            raise SystemExit(f"unknown SPARK_GRAFT_SWEEP_ONLY: {sorted(unknown)}")
        names = [n for n in names if n in keep]
    skip = {
        s.strip()
        for s in os.environ.get("SPARK_GRAFT_SWEEP_SKIP", "").split(",")
        if s.strip()
    }

    spark = get_spark(app_name="wmb-oracle-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        src = f"'{path}/*.parquet'" if os.path.isdir(path) else f"'{path}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")

    results: dict[str, dict] = {}
    for name in names:
        if name in skip:
            results[name] = {"ok": None, "skipped": True}
            print(f"{name}: SKIPPED", flush=True)
            continue
        t0 = time.time()
        try:
            problems = compare(qs[name](spark, sf_dir), con, osql[name], name)
            results[name] = {
                "ok": not problems,
                "sec": round(time.time() - t0, 1),
                **({"problems": problems[:2]} if problems else {}),
            }
        except Exception as ex:  # noqa: BLE001 — record and continue
            results[name] = {
                "ok": False,
                "sec": round(time.time() - t0, 1),
                "err": f"{type(ex).__name__}: {str(ex)[:300]}",
            }
        print(f"{name}: {results[name]}", flush=True)

    n_ok = sum(1 for r in results.values() if r.get("ok"))
    n_run = sum(1 for r in results.values() if not r.get("skipped"))
    print(
        json.dumps(
            {
                "metric": "wmb_sf1_oracle_sweep",
                "ok": n_ok,
                "run": n_run,
                "total": len(results),
                "sf_dir": sf_dir,
                "results": results,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
