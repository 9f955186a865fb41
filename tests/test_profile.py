"""One-pass profiling / expectation checks (profile.py)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from woe_monotonic_binning_spark.profile import check_expectations, column_profile

SF = "/root/testdata/sf0.001"


def test_profile_lineitem_stats(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    prof = {r["column"]: r for r in column_profile(li).collect()}
    n = li.count()
    assert set(prof) == set(li.columns)
    assert all(r["n_rows"] == n for r in prof.values())
    price = prof["l_extendedprice"]
    assert price["stat_basis"] == "value"
    exact = li.agg(
        F.min("l_extendedprice"), F.max("l_extendedprice"), F.avg("l_extendedprice")
    ).first()
    assert price["min"] == exact[0] and price["max"] == exact[1]
    assert price["mean"] == pytest.approx(exact[2])
    flag = prof["l_returnflag"]
    assert flag["stat_basis"] == "length"
    assert flag["min"] == 1.0 and flag["max"] == 1.0  # single-char flags
    assert flag["approx_distinct"] == 3  # A/N/R — HLL is exact at tiny cardinality
    ship = prof["l_shipdate"]
    assert ship["stat_basis"] == "epoch"
    assert ship["min"] is not None and ship["min"] < ship["max"]


def test_profile_counts_nulls_and_nans_separately(spark):
    # row tuples, not a pandas frame: Arrow conversion would turn the NaNs
    # into NULLs and the NaN/NULL distinction is exactly what's under test
    rows = [
        (1.0, "a"),
        (2.0, None),
        (float("nan"), "ccc"),
        (float("nan"), None),
        (5.0, "e"),
    ]
    df = spark.createDataFrame(rows, "x double, s string")
    prof = {r["column"]: r for r in column_profile(df).collect()}
    x = prof["x"]
    assert x["n_nan"] == 2 and x["n_null"] == 0
    assert x["mean"] == pytest.approx((1 + 2 + 5) / 3)  # moments exclude NaN
    assert x["min"] == 1.0 and x["max"] == 5.0
    s = prof["s"]
    assert s["n_null"] == 2
    assert s["null_frac"] == pytest.approx(0.4)
    assert s["min"] == 1.0 and s["max"] == 3.0  # length basis


def test_profile_handles_array_columns(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    prof = {r["column"]: r for r in column_profile(emb).collect()}
    e = prof["embedding"]
    assert e["stat_basis"] == "none"
    assert e["min"] is None and e["mean"] is None
    assert e["n_null"] == 0


def test_expectations_single_pass_with_null_as_violation(spark):
    pdf = pd.DataFrame(
        {
            "price": [10.0, -5.0, 20.0, None, 30.0],
            "qty": [1, 2, 3, 4, 5],
        }
    )
    df = spark.createDataFrame(pdf)
    out = {
        r["rule"]: r
        for r in check_expectations(
            df,
            {
                "price_nonneg": F.col("price") >= 0,
                "qty_in_range": F.col("qty").between(1, 5),
                "price_present": F.col("price").isNotNull(),
            },
        ).collect()
    }
    # -5 violates; NULL price evaluates NULL -> counted as violation too
    assert out["price_nonneg"]["n_violations"] == 2
    assert not out["price_nonneg"]["passed"]
    assert out["qty_in_range"]["n_violations"] == 0
    assert out["qty_in_range"]["passed"]
    assert out["price_present"]["n_violations"] == 1
    assert out["price_nonneg"]["violation_frac"] == pytest.approx(0.4)
    with pytest.raises(ValueError, match="no rules"):
        check_expectations(df, {})


def test_profile_and_expectations_are_one_scan_no_python(spark):
    from woe_monotonic_binning_spark.plans import python_eval_count, scan_read_columns

    spark.catalog.clearCache()
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    # the profile itself runs eagerly (driver assembles the tiny frame);
    # audit the aggregation plan it is built from instead
    agg = li.agg(
        F.count(F.lit(1)),
        F.sum(F.col("l_extendedprice").isNull().cast("long")),
        F.approx_count_distinct("l_extendedprice"),
    )
    assert len(scan_read_columns(agg)) == 1
    assert python_eval_count(agg) == 0


def test_profile_and_expectations_on_empty_table(spark):
    """Round-7 review: sum aggregates are NULL over zero rows; the gates
    must classify an empty partition, not crash on int(None)."""
    empty = spark.createDataFrame([], "x double, s string")
    prof = {r["column"]: r for r in column_profile(empty).collect()}
    assert prof["x"]["n_rows"] == 0 and prof["x"]["n_null"] == 0
    assert prof["x"]["null_frac"] == 0.0 and prof["x"]["min"] is None
    chk = check_expectations(empty, {"pos": F.col("x") >= 0}).first()
    assert chk["n_rows"] == 0 and chk["n_violations"] == 0 and chk["passed"]
