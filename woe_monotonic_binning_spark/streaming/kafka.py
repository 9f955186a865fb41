"""Kafka-shaped streaming source adapter.

Two entry points with one downstream contract — the Kafka wire schema
(key/value binary, topic, partition, offset, timestamp, timestampType) —
so every transformation written against it runs unchanged on either:

- ``read_kafka_stream``: the real ``format("kafka")`` source.  The Kafka
  connector jars (spark-sql-kafka) are not shipped in this container, so
  the call is gated: it raises a clear error with the ``--packages``
  coordinates instead of failing deep inside the data source resolver.
- ``kafka_shaped_file_stream``: a file-backed stand-in producing the exact
  same columns from a parquet directory.  This is how the adapter is
  tested here, and doubles as a replay source (dump a topic to parquet,
  re-run the pipeline deterministically).

At scale the real source maps one Spark task per Kafka topic-partition and
tracks offsets in the checkpoint; ``minPartitions`` splits hot
topic-partitions.  Everything downstream of ``load`` is shared code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

KAFKA_WIRE_SCHEMA = StructType(
    [
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampType()),
        StructField("timestampType", IntegerType()),
    ]
)

_KAFKA_PKG = "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>"


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    min_partitions: int | None = None,
) -> DataFrame:
    """``readStream.format("kafka")`` with the standard options, gated on
    connector availability."""
    # The classpath probe needs the py4j JVM handle; a Spark Connect
    # session has none, and treating that as "connector absent" would
    # refuse a reader that works (round-8 review) — on Connect, skip the
    # probe and let the server-side resolver raise its own
    # DATA_SOURCE_NOT_FOUND if kafka truly is missing.
    jvm = getattr(spark, "_jvm", None)
    if jvm is not None:
        try:
            jvm.java.lang.Class.forName(
                "org.apache.spark.sql.kafka010.KafkaSourceProvider"
            )
        except Exception as exc:  # noqa: BLE001 - class lookup failed => absent
            raise ImportError(
                "The Kafka connector is not on the classpath; launch with "
                f"spark.jars.packages={_KAFKA_PKG} (or use "
                "kafka_shaped_file_stream for a file-backed replay source)."
            ) from exc
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if min_partitions is not None:
        reader = reader.option("minPartitions", min_partitions)
    return reader.load()


def kafka_shaped_file_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Stream a parquet directory holding Kafka-wire-schema records.

    ``maxFilesPerTrigger`` plays the role of micro-batch sizing, so tests
    exercise genuine multi-batch incremental execution."""
    return (
        spark.readStream.schema(KAFKA_WIRE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def parse_json_value(stream: DataFrame, payload_schema) -> DataFrame:
    """Decode ``value`` (JSON bytes) into typed payload columns, keeping the
    Kafka metadata.  ``from_json`` is a JVM expression — the decode is
    map-side, codegen'd, and null-safe (malformed records yield nulls
    rather than failing the batch; filter on ``payload IS NULL`` to route a
    dead-letter stream)."""
    return stream.select(
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        F.col("timestamp").alias("kafka_ts"),
        F.from_json(F.col("value").cast("string"), payload_schema).alias("payload"),
    ).select("topic", "partition", "offset", "kafka_ts", "payload.*")


def events_to_kafka_records(events: DataFrame) -> DataFrame:
    """Encode an events table into Kafka wire records (the test producer):
    key = user id bytes, value = JSON bytes, offset = per-partition
    monotonic id.  Used to stage replay directories for
    ``kafka_shaped_file_stream``.

    Contract caveat: ``partition`` / ``offset`` derive from
    ``spark_partition_id()``, so they depend on the INPUT's physical layout —
    a different file split or upstream ``repartition`` relabels them.  That
    is fine for what they model (Kafka offsets are broker-assigned bookkeeping
    with no cross-run meaning), but do NOT key business logic on them: any
    semantically-meaningful ordering must come from the payload (``ts``,
    event ids), which is layout-invariant."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(F.spark_partition_id()).orderBy("ts")
    return events.select(
        F.col("user_id").cast("string").cast("binary").alias("key"),
        F.to_json(F.struct(*events.columns)).cast("binary").alias("value"),
        F.lit("events").alias("topic"),
        F.spark_partition_id().alias("partition"),
        (F.row_number().over(w) - 1).cast("long").alias("offset"),
        F.col("ts").alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )
