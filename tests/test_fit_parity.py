"""Golden parity: the Spark fit must match the reference cell-for-cell.

Strategy 2 of SURVEY.md section 5 — run the reference (pandas, erf-shimmed
norm.cdf) on the A1 fixture and compare the full 11-column bins tables to
1e-9 relative, covering the iterative ops (PAVA, z-merge, WOE-merge,
sep-stitch) and quirks Q1-Q12 end-to-end.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from woe_monotonic_binning_spark import batch_woe_binning, fit_bins, woe_binning, woe_binning_sep
from woe_monotonic_binning_spark._algo import BINS_COLUMNS

FEATURES = [
    "x_mono_up",
    "x_mono_down",
    "x_noise",
    "x_const",
    "x_with_nan",
    "x_sep",
    "x_few",
    "x_tiny_bins",
]


def assert_bins_equal(got: pd.DataFrame, exp: pd.DataFrame, ctx: str, tol: float = 1e-9):
    got = got.reset_index(drop=True)
    exp = exp.reset_index(drop=True)
    assert len(got) == len(exp), f"{ctx}: {len(got)} rows vs {len(exp)}"
    for col in BINS_COLUMNS:
        g, e = got[col].to_numpy(), exp[col].to_numpy()
        if col == "variable":
            assert (g == e).all(), f"{ctx}.{col}"
            continue
        g = g.astype(float)
        e = e.astype(float)
        same = (np.isnan(g) & np.isnan(e)) | (g == e) | (
            np.abs(g - e) <= tol * np.maximum(1.0, np.abs(e))
        )
        assert same.all(), f"{ctx}.{col}: {g} != {e}"


@pytest.mark.parametrize("n_threshold", [100, 500])
def test_batch_fit_matches_reference(spark, reference, binning_pdf, binning_df, n_threshold):
    bins = batch_woe_binning(
        binning_df.drop("row_id"), "target", n_threshold=n_threshold
    ).toPandas()
    for col in FEATURES:
        exp = reference.woe_binning("target", binning_pdf[[col, "target"]], n_threshold=n_threshold)
        assert_bins_equal(
            bins[bins.variable == col], exp, f"{col}@n_threshold={n_threshold}"
        )


def test_merge_threshold_matches_reference(spark, reference, binning_pdf, binning_df):
    bins = fit_bins(
        binning_df, "target", FEATURES, n_threshold=100, merge_threshold=0.5
    ).toPandas()
    for col in FEATURES:
        exp = reference.woe_binning(
            "target", binning_pdf[[col, "target"]], n_threshold=100, merge_threshold=0.5
        )
        assert_bins_equal(bins[bins.variable == col], exp, f"{col}@merge_threshold")


def test_sep_value_matches_reference(spark, reference, binning_pdf, binning_df):
    got = woe_binning_sep(
        binning_df, "target", "x_sep", sep_value=-999.0, n_threshold=100
    ).toPandas()
    exp = reference.woe_binning_sep(
        "target", "x_sep", binning_pdf[["x_sep", "target"]], sep_value=-999.0, n_threshold=100
    )
    assert_bins_equal(got, exp, "x_sep@sep_value")


def test_default_n_threshold_is_ceil_n_over_20(spark, reference, binning_pdf, binning_df):
    import math

    bins = batch_woe_binning(binning_df.drop("row_id"), "target").toPandas()
    thr = math.ceil(len(binning_pdf) / 20)
    exp = reference.woe_binning("target", binning_pdf[["x_mono_up", "target"]], n_threshold=thr)
    assert_bins_equal(bins[bins.variable == "x_mono_up"], exp, "default threshold")


def test_degenerate_guard(spark, binning_df):
    got = woe_binning(binning_df, "target", "target", n_threshold=100).toPandas()
    assert len(got) == 1
    assert got.loc[0, "variable"] == "target"
    assert (got.drop(columns="variable").iloc[0] == 0).all()


def test_tpch_lineitem_fit_smoke(spark, sf0001_dir):
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf0001_dir}/lineitem.parquet").withColumn(
        "target", (F.col("l_returnflag") == "R").cast("int")
    )
    bins = fit_bins(
        li,
        "target",
        ["l_extendedprice", "l_quantity", "l_discount", "l_tax"],
        n_threshold=100,
    ).toPandas()
    assert set(bins.variable) == {"l_extendedprice", "l_quantity", "l_discount", "l_tax"}
    for v, part in bins.groupby("variable"):
        means = part["mean"].to_numpy()
        assert (np.diff(means[~np.isnan(part.interval_start_include)]) < 0).all(), v


def test_merge_bins_matches_reference(spark, reference, binning_pdf, binning_df):
    """Public merge_bins parity with the reference (binning.py:14-29)."""
    from woe_monotonic_binning_spark import merge_bins, woe_binning

    got_bins = woe_binning(binning_df, "target", "x_mono_up", n_threshold=100)
    exp_bins = reference.woe_binning(
        "target", binning_pdf[["x_mono_up", "target"]], 100
    )
    assert got_bins.count() >= 3
    got = merge_bins(got_bins, [0, 1]).toPandas()
    exp = reference.merge_bins(exp_bins, [0, 1])
    assert_bins_equal(got, exp, "merge_bins[0,1]")
    # pandas frames work directly too
    got2 = merge_bins(got_bins.toPandas(), [1, 2])
    exp2 = reference.merge_bins(exp_bins, [1, 2])
    assert_bins_equal(got2, exp2, "merge_bins[1,2]")


def test_unpack_woe_forwards(spark, binning_df):
    from woe_monotonic_binning_spark import unpack_woe, woe_binning

    a = unpack_woe((binning_df, "target", "x_mono_up", 100)).toPandas()
    b = woe_binning(binning_df, "target", "x_mono_up", 100).toPandas()
    assert a.equals(b)


def test_quantize_cap_counts_only_non_null_distincts(spark):
    """Round-8 review: the distinct-count gate counted the NULL
    missing-group summary row, so a variable with exactly max_distinct
    non-null distincts plus NULLs was wrongly quantized instead of
    re-aggregating to itself bit-identically."""
    import pandas as pd

    from woe_monotonic_binning_spark.fit import quantize_summary

    rows = [("x", float(v), 10.0 - (v % 3), 1.0, 1.0) for v in range(8)]
    rows.append(("x", None, 5.0, 2.0, 2.0))  # the missing group
    summary = spark.createDataFrame(
        rows, "variable string, value double, size double, bads double, sumsq double"
    )
    out = quantize_summary(summary, max_distinct=8).toPandas()
    # 8 non-null distincts == cap: NOT over, so values survive verbatim
    got_vals = sorted(v for v in out["value"] if pd.notna(v))
    assert got_vals == [float(v) for v in range(8)]
    assert len(out) == 9


def test_merge_bins_survives_row_reorder_and_rejects_multi_variable(spark):
    """Round-8 review: positional bins_index over an arbitrarily-ordered
    Spark frame addressed the wrong rows; a reordered frame is now
    reconstructed (ascending, missing last) with a warning, and a
    multi-variable frame is rejected."""
    import warnings as _warnings

    import pandas as pd
    import pytest

    from woe_monotonic_binning_spark.fit import merge_bins

    pdf = pd.DataFrame(
        {
            "variable": ["x"] * 3,
            "interval_start_include": [0.0, 1.0, 2.0],
            "interval_end_exclude": [1.0, 2.0, 3.0],
            "size": [10.0, 20.0, 30.0],
            "mean": [0.2, 0.2, 0.2],
            "bads": [2.0, 4.0, 6.0],
            "goods": [8.0, 16.0, 24.0],
            "dist_good": [0.1, 0.2, 0.3],
            "dist_bad": [0.1, 0.2, 0.3],
            "woe": [0.5, 0.1, -0.4],
            "iv_components": [0.1, 0.1, 0.1],
        }
    )
    sdf = spark.createDataFrame(pdf)
    ordered = merge_bins(sdf, [0, 1]).toPandas()
    # shuffle the row order: same logical table, reordered partitions
    shuffled = spark.createDataFrame(pdf.iloc[[2, 0, 1]])
    with _warnings.catch_warnings(record=True) as w:
        _warnings.simplefilter("always")
        re_ordered = merge_bins(shuffled, [0, 1]).toPandas()
    assert any("fit order" in str(x.message) for x in w)
    assert sorted(map(tuple, ordered.values.tolist())) == sorted(
        map(tuple, re_ordered.values.tolist())
    )
    two = pd.concat([pdf, pdf.assign(variable="y")], ignore_index=True)
    with pytest.raises(ValueError, match="single variable"):
        merge_bins(spark.createDataFrame(two), [0, 1])
