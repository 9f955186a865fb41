"""Structured Streaming twins of the batch window operators.

The transformations are the same column expressions as
``operators/windows.py`` — the streaming plan adds a watermark for state
eviction.  ``run_available_now`` drives a bounded backfill (parquet source,
``availableNow`` trigger, memory sink) so tests can assert stream == batch.

At scale: the parquet source becomes Kafka; ``withWatermark`` bounds state
for late data; output mode "update"/"append" per sink semantics.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_events_stream(
    spark: SparkSession, path: str, schema_from: DataFrame | None = None
) -> DataFrame:
    schema = (schema_from or spark.read.parquet(path)).schema
    return spark.readStream.schema(schema).parquet(path)


def streaming_tumbling_agg(
    stream: DataFrame, width: str = "1 hour", watermark: str = "10 minutes"
) -> DataFrame:
    # watermarks require TimestampType; the parquet source yields NTZ
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_available_now(
    result: DataFrame, query_name: str | None = None, output_mode: str = "complete"
) -> DataFrame:
    """Execute a streaming DataFrame to completion against a memory sink and
    return the materialised result as a batch DataFrame.  ``output_mode``
    "complete" fits windowed aggregations; stateful row-emitting operators
    (dropDuplicates*, flatMapGroupsWithState) require "append"."""
    name = query_name or f"stream_{uuid.uuid4().hex[:8]}"
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return result.sparkSession.table(name)
