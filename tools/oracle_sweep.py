#!/usr/bin/env python
"""sf1 oracle sweep (round-9 verdict #3, carried to round 11): re-run
every oracle-backed catalog compare — the same row-count + schema +
order-insensitive value comparison the driver certifies at sf0.01 — on a
~sf1 dataset (tools/make_sf1.py), so the certified semantics are
validated one decade of scale past the certification point.

Differences from the driver harness, all mechanical:
- the sf1 tables are Spark-written DIRECTORIES, so the DuckDB views glob
  '<table>.parquet/*.parquet';
- the comparison is a VECTORIZED canonicalisation (every column rendered
  to a canonical string: floats rounded to 9 dp with -0.0 folded,
  timestamps ISO, NULL sentinel; frames sorted by all columns, ndarray
  equality) instead of oracle_harness._normalise's per-row Python loop —
  same semantics, but a 40M-row melt result compares in seconds instead
  of hours;
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


def _canon_col(s):
    """Render one pandas column to canonical strings: NULL sentinel,
    floats/bools as round-9 floats with -0.0 folded to 0.0, ints EXACT
    (float render when float64-representable so int == float equality
    matches the driver, exact decimal string otherwise — round-11
    advice), timestamps as naive ISO — the vectorized twin of
    oracle_harness._normalise's per-value rules."""
    import numpy as np
    import pandas as pd

    if pd.api.types.is_datetime64_any_dtype(s):
        try:
            s = s.dt.tz_localize(None)
        except TypeError:
            pass
        out = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        return out.where(s.notna(), "<NULL>")
    def canon_int(i):
        # Mirror oracle_harness._normalise, which keeps ints EXACT (round-11
        # advice: routing int64 through float64 canonicalises values above
        # 2^53 lossily — two distinct hashes could false-PASS).  An int that
        # round-trips through float64 exactly renders via the float rule, so
        # it still compares equal to an equal-valued DOUBLE on the other
        # side (the driver's int == float tuple equality); a non-
        # representable int renders as its exact decimal string, which can
        # never match any float render — exactly the driver's behavior.
        try:
            f = float(i)
            exact = int(f) == i
        except OverflowError:
            exact = False
        return repr(f + 0.0) if exact else repr(int(i))

    if s.dtype.kind in "iu":
        # na_action="ignore": a pandas nullable Int64 column can carry
        # pd.NA, which float(i) rejects with TypeError (not the caught
        # OverflowError) — let NAs flow to the <NULL> sentinel below
        out = s.map(canon_int, na_action="ignore")
        return out.where(s.notna(), "<NULL>")
    if s.dtype.kind in "fb":
        f = s.astype("float64").round(9) + 0.0  # fold -0.0
        # repr over a PYTHON float, not the np.float64 element: under
        # numpy >= 2 repr(np.float64(5.0)) is 'np.float64(5.0)', which
        # would spuriously mismatch the int branch's Python-float render
        out = f.map(lambda x: repr(float(x)), na_action="ignore")
        return out.where(~f.isna(), "<NULL>")
    # object columns: decimals/strings/None/NaN; numeric objects (DuckDB
    # HUGEINT/DECIMAL fetch as objects) follow the same int-exact/float
    # rules as the typed columns above
    import decimal

    def one(v):
        if v is None or (isinstance(v, float) and v != v):
            return "<NULL>"
        if isinstance(v, int) and not isinstance(v, bool):
            return canon_int(v)
        if isinstance(v, decimal.Decimal) and v == v.to_integral_value():
            return canon_int(int(v))
        if isinstance(v, (float, decimal.Decimal)):
            return repr(round(float(v), 9) + 0.0)
        return str(v)

    return s.map(one)


def compare_fast(got, exp, name: str) -> list[str]:
    """Row-count + schema + order-insensitive value compare, vectorized."""
    problems: list[str] = []
    if sorted(got.columns) != sorted(exp.columns):
        return [f"{name}: columns {sorted(got.columns)} vs {sorted(exp.columns)}"]
    if len(got) != len(exp):
        problems.append(f"{name}: rows {len(got)} vs {len(exp)}")
        return problems
    cols = sorted(got.columns)
    g = {c: _canon_col(got[c]) for c in cols}
    e = {c: _canon_col(exp[c]) for c in cols}
    import pandas as pd

    gdf = pd.DataFrame(g).sort_values(cols, kind="mergesort").reset_index(drop=True)
    edf = pd.DataFrame(e).sort_values(cols, kind="mergesort").reset_index(drop=True)
    for c in cols:
        neq = (gdf[c].values != edf[c].values).nonzero()[0]
        if len(neq):
            i = int(neq[0])
            problems.append(
                f"{name}: {len(neq)} value diffs in {c}; first at sorted row "
                f"{i}: {gdf[c].iloc[i]!r} vs {edf[c].iloc[i]!r}"
            )
            break
    return problems


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/wmb_sf1"

    import duckdb

    import __spark_entry__ as entry
    from tests.oracle_harness import TABLES
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

    def _alive(s) -> bool:
        try:
            return not s.sparkContext._jsc.sc().isStopped()
        except Exception:  # noqa: BLE001
            return False

    results: dict[str, dict] = {}
    for name in names:
        if name in skip:
            results[name] = {"ok": None, "skipped": True}
            print(f"{name}: SKIPPED", flush=True)
            continue
        if not _alive(spark):
            # a heavy query OOM'd the JVM (an executor OutOfMemoryError
            # shuts the whole local SparkContext down): rebuild the
            # session so one pathological query cannot void the rest of
            # the sweep
            print(f"{name}: SparkContext dead — rebuilding session", flush=True)
            spark = get_spark(app_name="wmb-oracle-sweep")
            spark.sparkContext.setLogLevel("ERROR")
        t0 = time.time()
        try:
            got = qs[name](spark, sf_dir).toPandas()
            exp = con.execute(osql[name]).fetchdf()
            problems = compare_fast(got, exp, name)
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
        try:
            spark.catalog.clearCache()  # bound cross-query heap growth
        except Exception:  # noqa: BLE001
            pass

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
