"""Regression tests for the round-1 ADVICE.md findings.

One test per finding:
- decimal feature columns are picked up by default column inference
- WOEBinnerModel materialises its bins (transform/save never refit)
- sep_value=0.0 is active (deviation D5) and absent sep values fall back
  to the plain fit (D6)
- sessionize_stream's gap parsing accepts any Spark interval form
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_decimal_columns_inferred(spark):
    df = (
        spark.range(200)
        .select(
            (F.col("id") % 2).cast("double").alias("target"),
            (F.col("id") % 7).cast("decimal(12,2)").alias("dec_feat"),
            (F.col("id") % 5).cast("double").alias("dbl_feat"),
        )
    )
    from woe_monotonic_binning_spark import batch_woe_binning

    bins = batch_woe_binning(df, "target", n_threshold=10).toPandas()
    assert set(bins["variable"]) == {"dec_feat", "dbl_feat"}


def test_model_bins_are_materialised(binning_df):
    from woe_monotonic_binning_spark.ml import WOEBinner

    model = WOEBinner(targetCol="target", inputCols=["x_mono_up"], nThreshold=40.0).fit(
        binning_df
    )
    plan = model.binsTable._jdf.queryExecution().analyzed().toString()
    # a local collection (LogicalRDD over collected rows / LocalRelation) has
    # no scan/exchange lineage: clearCache or repeated transform()/save()
    # calls cannot re-trigger the distributed fit
    assert any(s in plan for s in ("LocalRelation", "LocalTableScan", "LogicalRDD"))
    assert "Aggregate" not in plan and "FlatMapGroupsInPandas" not in plan
    assert model.binsTable.count() > 0


def test_sep_value_zero_is_active(spark):
    pdf = pd.DataFrame(
        {
            "target": ([0, 1] * 150),
            # 0.0 is a sentinel taking ~a third of rows; the rest spread out
            "x": [0.0 if i % 3 == 0 else float(i % 50) + 1.0 for i in range(300)],
        }
    )
    df = spark.createDataFrame(pdf)
    from woe_monotonic_binning_spark import woe_binning_sep

    bins = woe_binning_sep(df, "target", "x", sep_value=0.0, n_threshold=15).toPandas()
    # target rate is 0.5 everywhere, so a plain fit collapses to ONE bin;
    # the active sep path isolates the 100 zero rows behind the reference's
    # epsilon-stitched boundary (binning.py:49-71) into their own bin
    assert len(bins) == 2, "sep_value=0.0 must take the sep path (D5)"
    assert (bins["size"] == 100.0).any()

    from woe_monotonic_binning_spark import fit_bins

    assert len(fit_bins(df, "target", ["x"], n_threshold=15).toPandas()) == 1


def test_sep_value_absent_falls_back_to_plain_fit(spark):
    pdf = pd.DataFrame(
        {"target": [0, 1] * 100, "x": [float(i % 10) + 1.0 for i in range(200)]}
    )
    df = spark.createDataFrame(pdf)
    from woe_monotonic_binning_spark import fit_bins

    # -999 never occurs: reference would IndexError, engine fits plain (D6)
    bins = fit_bins(df, "target", ["x"], n_threshold=10, sep_value=-999.0).toPandas()
    assert len(bins) >= 1
    assert not (
        (bins["interval_start_include"] == -999.0)
        & (bins["interval_end_exclude"] == -999.0)
    ).any()


@pytest.mark.parametrize(
    "text,ms",
    [
        ("30 minutes", 30 * 60_000),
        ("90 seconds", 90_000),
        ("1 day", 86_400_000),
        ("1 hour 30 minutes", 5_400_000),
    ],
)
def test_interval_ms_spark_parser(spark, text, ms):
    from woe_monotonic_binning_spark.streaming.stateful import _interval_ms

    assert _interval_ms(spark, text) == ms


@pytest.mark.parametrize("bad", ["soon", "-5 minutes", "0 seconds"])
def test_interval_ms_rejects(spark, bad):
    from woe_monotonic_binning_spark.streaming.stateful import _interval_ms

    with pytest.raises(ValueError):
        _interval_ms(spark, bad)
