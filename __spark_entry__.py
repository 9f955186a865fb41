"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship fit at sf0.001.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md section 2 (plus the beyond-reference ops); the driver compares each
Spark result against its DuckDB oracle at sf0.01 (row-count + schema +
order-insensitive value-hash).  Float columns are rounded identically on
both sides so the hash compares semantics, not summation order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: batch WOE fit of four lineitem features at sf0.001."""
    from pyspark.sql import functions as F

    from woe_monotonic_binning_spark import fit_bins

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").withColumn(
        "target", (F.col("l_returnflag") == "R").cast("int")
    )
    return fit_bins(
        li,
        "target",
        ["l_extendedprice", "l_quantity", "l_discount", "l_tax"],
        n_threshold=100,
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from queries_catalog import SPARK_QUERIES

    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    from queries_catalog import ORACLE_SQL

    return dict(ORACLE_SQL)
