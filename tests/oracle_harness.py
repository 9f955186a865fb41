"""Local replica of the driver's DuckDB oracle comparison.

Runs a Spark query and its oracle SQL on the same sf dir, then compares
row count, column names/dtypes, and an order-insensitive multiset of
normalised values.  Used by tests/test_oracle_local.py and directly while
developing new catalog entries.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalise(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        out = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                out.append(None)
            elif isinstance(v, (np.floating, float)):
                f = float(v)
                out.append(round(f, 9) if math.isfinite(f) else f)
            elif isinstance(v, (np.integer, int)):
                out.append(int(v))
            elif isinstance(v, (list, np.ndarray)):
                # same convention as scalars: NULL and NaN elements both
                # normalise to None (float(None) raised; NaN never compared
                # equal to itself), non-numeric elements pass through — so a
                # dev compare over an array column reports a diff instead of
                # crashing.  No certified query emits a raw array (arrays
                # are string-joined on both sides precisely for hashing).
                out.append(
                    tuple(
                        None
                        if x is None
                        or (isinstance(x, (float, np.floating)) and math.isnan(x))
                        else round(float(x), 6)
                        if isinstance(x, (int, float, np.integer, np.floating))
                        else x
                        for x in v
                    )
                )
            elif isinstance(v, pd.Timestamp):
                out.append(v.to_pydatetime().replace(tzinfo=None))
            else:
                out.append(v)
        rows.append(tuple(out))
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return rows


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str) -> list[str]:
    """Return a list of problems (empty == match)."""
    problems: list[str] = []
    got = spark_df.toPandas()
    exp = con.execute(sql).fetchdf()
    if sorted(got.columns) != sorted(exp.columns):
        problems.append(f"{name}: columns {sorted(got.columns)} vs {sorted(exp.columns)}")
        return problems
    if len(got) != len(exp):
        problems.append(f"{name}: rows {len(got)} vs {len(exp)}")
    g, e = _normalise(got), _normalise(exp)
    if g != e:
        diff = [i for i, (a, b) in enumerate(zip(g, e)) if a != b][:3]
        sample = [(g[i], e[i]) for i in diff]
        problems.append(f"{name}: value mismatch; first diffs {sample}")
    return problems
