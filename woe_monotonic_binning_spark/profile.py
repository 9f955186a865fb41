"""Pre-flight data-quality profiling: one-pass column statistics and
expectation checks for ANY input table — the "is this 100 TB of parquet
what I think it is" gate a pipeline runs before committing cluster-days to
a fit or a curation job.

Both operators are a SINGLE map-side aggregation pass (partial aggregation,
no shuffle beyond the one-row final combine): the cost of profiling is one
scan, independent of how many columns or rules are checked.  Driver
materialisation is bounded by columns x stats (a few KB).
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def column_profile(df: DataFrame, columns: Sequence[str] | None = None) -> DataFrame:
    """One row of statistics per column, computed in ONE aggregation pass.

    Output: ``column, dtype, stat_basis, n_rows, n_null, null_frac,
    n_nan, approx_distinct, min, max, mean, stddev``.

    ``stat_basis`` says what the min/max/mean/stddev describe — ``value``
    for numeric columns (NaNs excluded from the moments, counted in
    ``n_nan``), ``length`` for strings (character counts), ``epoch`` for
    timestamps/dates (seconds), ``none`` for anything else (nulls only).
    ``approx_distinct`` is HyperLogLog (~2% error) — the cardinality
    smell test, not an exact count.  All stats are doubles so one fixed
    schema covers every column type."""
    if columns is None:
        columns = [f.name for f in df.schema.fields]
    fields = {f.name: f.dataType for f in df.schema.fields}
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    basis: dict[str, str] = {}
    for c in columns:
        dt = fields[c]
        col = F.col(c)
        if isinstance(dt, _NUMERIC):
            basis[c] = "value"
            v = F.nanvl(col.cast("double"), F.lit(None).cast("double")) if isinstance(
                dt, (T.FloatType, T.DoubleType)
            ) else col.cast("double")
            nan_count = (
                F.sum(F.isnan(col).cast("long"))
                if isinstance(dt, (T.FloatType, T.DoubleType))
                else F.lit(0)
            )
        elif isinstance(dt, T.StringType):
            basis[c] = "length"
            v = F.length(col).cast("double")
            nan_count = F.lit(0)
        elif isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            basis[c] = "epoch"
            v = F.unix_timestamp(col.cast("timestamp")).cast("double")
            nan_count = F.lit(0)
        else:
            basis[c] = "none"
            v = F.lit(None).cast("double")
            nan_count = F.lit(0)
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"__null_{c}"),
            nan_count.alias(f"__nan_{c}"),
            F.approx_count_distinct(col).alias(f"__dist_{c}"),
            F.min(v).alias(f"__min_{c}"),
            F.max(v).alias(f"__max_{c}"),
            F.avg(v).alias(f"__mean_{c}"),
            F.stddev(v).alias(f"__std_{c}"),
        ]
    row = df.agg(*aggs).first()
    n = row["__n"]
    # `or 0` throughout: over an EMPTY table every sum aggregate is NULL,
    # and a pre-flight gate pointed at an empty partition must report
    # n_rows=0, not crash on int(None)
    out = pd.DataFrame(
        [
            {
                "column": c,
                "dtype": fields[c].simpleString(),
                "stat_basis": basis[c],
                "n_rows": int(n),
                "n_null": int(row[f"__null_{c}"] or 0),
                "null_frac": ((row[f"__null_{c}"] or 0) / n) if n else 0.0,
                "n_nan": int(row[f"__nan_{c}"] or 0),
                "approx_distinct": int(row[f"__dist_{c}"] or 0),
                "min": row[f"__min_{c}"],
                "max": row[f"__max_{c}"],
                "mean": row[f"__mean_{c}"],
                "stddev": row[f"__std_{c}"],
            }
            for c in columns
        ]
    )
    return df.sparkSession.createDataFrame(
        out.astype(object).where(pd.notna(out), None),
        "column string, dtype string, stat_basis string, n_rows long, "
        "n_null long, null_frac double, n_nan long, approx_distinct long, "
        "min double, max double, mean double, stddev double",
    )


def check_expectations(
    df: DataFrame, rules: dict[str, Column]
) -> DataFrame:
    """Evaluate named row-level expectations in ONE pass: each rule is a
    boolean Column (e.g. ``F.col('price') >= 0``); the result has one row
    per rule — ``rule, n_rows, n_violations, violation_frac, passed`` —
    where a NULL rule evaluation counts as a VIOLATION (three-valued
    logic would otherwise let a null-riddled column sail through a range
    check).  Compose the gate as ``result.filter(~F.col('passed'))``:
    empty means the table meets the contract.

    Scale: all rules fold into one map-side aggregation — checking 50
    expectations over 100 TB costs the same single scan as checking one.
    """
    if not rules:
        raise ValueError("no rules given; nothing to check")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, cond in rules.items():
        aggs.append(
            F.sum((~F.coalesce(cond, F.lit(False))).cast("long")).alias(
                f"__viol_{name}"
            )
        )
    row = df.agg(*aggs).first()
    n = int(row["__n"])
    # `or 0`: over an empty table the violation sums are NULL — the gate
    # must classify the degenerate input (0 violations, passed), not crash
    out = pd.DataFrame(
        [
            {
                "rule": name,
                "n_rows": n,
                "n_violations": int(row[f"__viol_{name}"] or 0),
                "violation_frac": ((row[f"__viol_{name}"] or 0) / n) if n else 0.0,
                "passed": int(row[f"__viol_{name}"] or 0) == 0,
            }
            for name in rules
        ]
    )
    return df.sparkSession.createDataFrame(
        out,
        "rule string, n_rows long, n_violations long, violation_frac double, "
        "passed boolean",
    )
