"""Golden parity for the transform path (apply_bins, binning.py:268-304)."""

from __future__ import annotations

import numpy as np
import pytest

from woe_monotonic_binning_spark import apply_bins, batch_woe_binning


@pytest.fixture(scope="module")
def fitted(reference, binning_pdf):
    cols = [c for c in binning_pdf.columns if c not in ("target", "row_id")]
    return {
        c: reference.woe_binning("target", binning_pdf[[c, "target"]], n_threshold=100)
        for c in cols
    }


def test_transform_matches_reference(spark, reference, binning_pdf, binning_df, fitted):
    bins = batch_woe_binning(binning_df.drop("row_id"), "target", n_threshold=100).toPandas()
    got = (
        apply_bins(binning_df, bins, keep_columns=["row_id"])
        .toPandas()
        .sort_values("row_id")
        .reset_index(drop=True)
    )
    exp = reference.apply_bins(binning_pdf, fitted).reset_index(drop=True)
    assert sorted(c for c in got.columns if c != "row_id") == sorted(exp.columns)
    for col in exp.columns:
        g = got[col].to_numpy(dtype=float)
        e = exp[col].to_numpy(dtype=float)
        same = (np.isnan(g) & np.isnan(e)) | (g == e) | (np.abs(g - e) <= 1e-9)
        assert same.all(), f"{col}: {np.sum(~same)} mismatching rows"


def test_transform_gates(spark, binning_df):
    bins = batch_woe_binning(binning_df.drop("row_id"), "target", n_threshold=100).toPandas()
    out_cols = apply_bins(binning_df, bins, keep_columns=["row_id"]).columns
    # x_noise fails the IV gate, x_const the bin-count gate, and exactly one
    # of the duplicated-IV pair survives corr dedup
    assert "x_noise_bin" not in out_cols
    assert "x_const_bin" not in out_cols
    no_dedup = apply_bins(binning_df, bins, remove_100_corr=False).columns
    assert len(no_dedup) >= len(out_cols) - 1


def test_transform_impute_approx(spark, binning_df):
    """``impute="approx"`` (deviation D7): the median pre-pass plan swaps the
    exact percentile (distinct-count-bound memory) for percentile_approx
    (bounded sketch), and the resulting encodings are unchanged — any
    realistic approx-median lands in the same WOE bin as the exact one."""
    from woe_monotonic_binning_spark.plans import formatted_plan
    from woe_monotonic_binning_spark.transform import median_prepass

    variables = ["x_mono_up", "x_with_nan"]
    approx_plan = formatted_plan(median_prepass(binning_df, variables, "approx"))
    assert "percentile_approx" in approx_plan
    assert "percentile(" not in approx_plan.replace("percentile_approx(", "")
    exact_plan = formatted_plan(median_prepass(binning_df, variables, "exact"))
    assert "percentile_approx" not in exact_plan

    bins = batch_woe_binning(binning_df.drop("row_id"), "target", n_threshold=100).toPandas()
    exact = (
        apply_bins(binning_df, bins, keep_columns=["row_id"])
        .toPandas().sort_values("row_id").reset_index(drop=True)
    )
    approx = (
        apply_bins(binning_df, bins, keep_columns=["row_id"], impute="approx")
        .toPandas().sort_values("row_id").reset_index(drop=True)
    )
    assert exact.equals(approx)

    with pytest.raises(ValueError, match="impute"):
        apply_bins(binning_df, bins, impute="bogus")


def test_transform_impute_auto_switch_point(spark, binning_df):
    """``impute="auto"`` probes approx_count_distinct per variable and picks
    exact percentile at/below ``auto_distinct_limit``, percentile_approx
    above — pinned at both sides of the switch, and encodings on the driver
    data are identical either way."""
    from pyspark.sql import functions as F

    from woe_monotonic_binning_spark.plans import formatted_plan
    from woe_monotonic_binning_spark.transform import median_prepass

    variables = ["x_mono_up", "x_with_nan"]
    # limit above every cardinality -> all-exact plan
    hi = formatted_plan(median_prepass(binning_df, variables, "auto", 10**9))
    assert "percentile_approx" not in hi
    # limit below every cardinality -> all-approx plan
    lo = formatted_plan(median_prepass(binning_df, variables, "auto", 1))
    assert "percentile_approx" in lo
    assert "percentile(" not in lo.replace("percentile_approx(", "")
    # mixed: a 2-distinct column stays exact while a high-cardinality
    # sibling switches to approx in the SAME pre-pass
    two_level = binning_df.withColumn(
        "x_two", (F.col("x_mono_up") > 0.5).cast("double")
    )
    mixed = formatted_plan(median_prepass(two_level, ["x_two", "x_mono_up"], "auto", 10))
    assert "percentile_approx" in mixed and "percentile(" in mixed.replace(
        "percentile_approx(", ""
    )

    bins = batch_woe_binning(binning_df.drop("row_id"), "target", n_threshold=100).toPandas()
    exact = (
        apply_bins(binning_df, bins, keep_columns=["row_id"])
        .toPandas().sort_values("row_id").reset_index(drop=True)
    )
    auto = (
        apply_bins(binning_df, bins, keep_columns=["row_id"], impute="auto",
                   auto_distinct_limit=1)
        .toPandas().sort_values("row_id").reset_index(drop=True)
    )
    assert exact.equals(auto)


def test_transform_woe_values_subset_of_fit(spark, binning_df):
    bins = batch_woe_binning(binning_df.drop("row_id"), "target", n_threshold=100).toPandas()
    scored = apply_bins(binning_df, bins).toPandas()
    for col in scored.columns:
        var = col[: -len("_bin")]
        fitted_woes = set(np.round(bins[bins.variable == var]["woe"].dropna(), 12))
        got = set(np.round(scored[col].dropna().unique(), 12))
        assert got <= fitted_woes, f"{col}: {got - fitted_woes}"


def test_median_prepass_histogram_equals_row_level_percentile(spark):
    """Round-8 guard for the histogram rewrite: the melt -> count ->
    percentile(value, 0.5, n) exact path must be bit-identical to the
    row-level percentile it replaced, across NaN/NULL mixes, an all-NULL
    column, an integer column and ties."""
    import random

    from pyspark.sql import functions as F

    from woe_monotonic_binning_spark.transform import median_prepass

    rng = random.Random(77)
    rows = []
    for i in range(500):
        a = rng.choice([None, float("nan"), rng.uniform(-5, 5), float(rng.randint(0, 3))])
        b = rng.randint(-10, 10)
        c = None  # all-NULL column
        d = rng.choice([0.25, 0.5, 0.5, 1.75])  # heavy ties
        rows.append((a, b, c, d))
    df = spark.createDataFrame(
        rows, "a double, b int, c double, d double"
    )
    variables = ["a", "b", "c", "d"]
    got = median_prepass(df, variables, "exact").first()
    exp = df.select(
        *[
            F.expr(
                f"percentile(nanvl(cast(`{v}` as double), cast(NULL as double)), 0.5D)"
            ).alias(v)
            for v in variables
        ]
    ).first()
    for v in variables:
        g, e = got[v], exp[v]
        if e is None:
            assert g is None, v
        else:
            assert g == e, (v, g, e)  # bit-identical, not approx
    assert got["c"] is None  # all-NULL column reports NULL median

