"""Streaming WOE scoring == batch transform, record for record."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from woe_monotonic_binning_spark import apply_bins, batch_woe_binning
from woe_monotonic_binning_spark.streaming.score import score_stream, write_stream_parquet
from woe_monotonic_binning_spark.transform import median_prepass

SF = "/root/testdata/sf0.001"


def _fit(spark):
    df = spark.read.parquet(f"{SF}/lineitem.parquet").withColumn(
        "target", (F.col("l_returnflag") == "R").cast("int")
    )
    bins = batch_woe_binning(df, "target", n_threshold=100).toPandas()
    return df, bins


@pytest.fixture(scope="module")
def li_dir(spark, tmp_path_factory):
    """File stream sources need a directory; stage one from the single-file
    testdata parquet."""
    out = str(tmp_path_factory.mktemp("li_stream") / "lineitem")
    spark.read.parquet(f"{SF}/lineitem.parquet").write.mode("overwrite").parquet(out)
    return out


def test_stream_scoring_matches_batch(spark, tmp_path, li_dir):
    df, bins = _fit(spark)
    variables = sorted(bins["variable"].unique())
    med_row = median_prepass(df, variables).first()
    medians = {v: med_row[v] for v in variables if med_row[v] is not None}

    stream = spark.readStream.schema(df.drop("target").schema).parquet(li_dir)
    scored = score_stream(
        stream, bins, medians=medians, iv_threshold=0.0,
        keep_columns=["l_orderkey", "l_linenumber"],
    )
    assert scored.isStreaming
    out_dir, ckpt = str(tmp_path / "scored"), str(tmp_path / "ckpt")
    q = write_stream_parquet(scored, out_dir, ckpt)
    q.awaitTermination()

    got = (
        spark.read.parquet(out_dir)
        .orderBy("l_orderkey", "l_linenumber")
        .toPandas()
        .reset_index(drop=True)
    )
    exp = (
        apply_bins(
            df, bins, iv_threshold=0.0, medians=medians,
            keep_columns=["l_orderkey", "l_linenumber"],
        )
        .orderBy("l_orderkey", "l_linenumber")
        .toPandas()
        .reset_index(drop=True)
    )
    assert sorted(got.columns) == sorted(exp.columns)
    assert got[sorted(got.columns)].equals(exp[sorted(exp.columns)])
    assert len(got) == df.count()


def test_stream_scoring_without_medians_leaves_nulls(spark, li_dir):
    df, bins = _fit(spark)
    stream = spark.readStream.schema(df.drop("target").schema).parquet(li_dir)
    scored = score_stream(stream, bins, iv_threshold=0.0, keep_columns=["l_orderkey"])
    name = f"score_{uuid.uuid4().hex[:8]}"
    q = (
        scored.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = spark.table(name)
    assert got.count() == df.count()
    # same encode as batch with impute disabled
    exp = apply_bins(df, bins, iv_threshold=0.0, impute_median=False, keep_columns=["l_orderkey"])
    assert got.exceptAll(exp).count() == 0
