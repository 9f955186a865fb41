"""Source/sink round-trips: formats, partitioned layout, bucketed joins,
bins-model persistence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from woe_monotonic_binning_spark import apply_bins, fit_bins
from woe_monotonic_binning_spark.sources.io import (
    load_bins,
    read_table,
    save_bins,
    write_bucketed_table,
    write_table,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def nation(spark):
    return spark.read.parquet(f"{SF}/nation.parquet").cache()


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_format_roundtrip(spark, tmp_path, nation, fmt):
    path = str(tmp_path / f"nation_{fmt}")
    write_table(nation, path, fmt=fmt)
    back = read_table(spark, path, fmt=fmt, schema=nation.schema)
    assert back.count() == nation.count()
    assert [f.name for f in back.schema] == [f.name for f in nation.schema]
    assert back.exceptAll(nation).count() == 0


def test_partitioned_write_prunes(spark, tmp_path):
    from woe_monotonic_binning_spark.plans import formatted_plan

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "docs_by_lang")
    write_table(docs, path, partition_by=["lang"])
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    one = read_table(spark, path).filter(F.col("lang") == langs[0])
    assert one.count() == docs.filter(F.col("lang") == langs[0]).count()
    # partition pruning: the scan's file listing is restricted to one dir
    assert "PartitionFilters: [isnotnull(lang" in formatted_plan(one)


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    from woe_monotonic_binning_spark.plans import exchange_count

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    write_bucketed_table(orders, "orders_b", ["o_custkey"], 8, mode="overwrite")
    try:
        bucketed = spark.table("orders_b")
        agg = bucketed.groupBy("o_custkey").agg(F.sum("o_totalprice"))
        # aggregation on the bucket key: zero Exchange in the plan
        assert exchange_count(agg) == 0
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")


def test_bins_model_roundtrip(spark, tmp_path):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").withColumn(
        "target", (F.col("l_returnflag") == "R").cast("double")
    )
    bins = fit_bins(li, "target", ["l_extendedprice", "l_quantity"], n_threshold=100)
    path = str(tmp_path / "bins_model")
    save_bins(bins, path)
    back = load_bins(spark, path)
    assert back.columns == bins.columns
    key = ["variable", "interval_start_include"]
    assert sorted(map(str, back.collect())) == sorted(map(str, bins.collect()))
    # reloaded bins drive the transform identically
    a = apply_bins(li, bins, iv_threshold=0.0, keep_columns=["l_orderkey"])
    b = apply_bins(li, back, iv_threshold=0.0, keep_columns=["l_orderkey"])
    assert a.exceptAll(b).count() == 0


def test_unsupported_format_raises(spark, nation, tmp_path):
    with pytest.raises(ValueError, match="unsupported format"):
        write_table(nation, str(tmp_path / "x"), fmt="avro")
    with pytest.raises(ValueError, match="unsupported format"):
        read_table(spark, str(tmp_path / "x"), fmt="xml")
