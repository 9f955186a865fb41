"""Streaming WOE scoring: apply a fitted bins table to a live stream.

The transform path (transform.py) compiles bins into CASE-WHEN column
expressions — a stateless projection, which Structured Streaming runs
unchanged, record-at-a-time, with no state store and no watermark.  The
one batch-only piece is the median pre-pass (an aggregation cannot run
mid-plan on a stream), so fill values are precomputed on historical data
via :func:`~woe_monotonic_binning_spark.transform.median_prepass` and
passed in, exactly the train-time-statistics-at-serve-time pattern every
feature store uses.

At scale: the scoring projection is whole-stage-codegen'd per micro-batch;
throughput is source-bound (Kafka/files), not transform-bound.  The parquet
sink below checkpoints offsets for exactly-once file output.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def score_stream(
    stream: DataFrame,
    bins,
    medians: dict[str, float] | None = None,
    iv_threshold: float = 0.02,
    bin_threshold: int = 2,
    remove_100_corr: bool = True,
    keep_columns: Sequence[str] | None = None,
) -> DataFrame:
    """WOE-encode a streaming DataFrame (one ``<col>_bin`` per survivor).

    ``medians``: precomputed NULL/NaN fill values (variable -> median) from
    the training pass; omit to leave missing rows NULL (pandas-NaN
    semantics of the reference, binning.py:296-303).
    """
    from ..transform import apply_bins

    return apply_bins(
        stream,
        bins,
        iv_threshold=iv_threshold,
        bin_threshold=bin_threshold,
        remove_100_corr=remove_100_corr,
        keep_columns=keep_columns,
        impute_median=medians is not None,
        medians=medians if medians is not None else {},
    )


def write_stream_parquet(
    result: DataFrame,
    path: str,
    checkpoint: str,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Append-mode parquet sink with offset checkpointing (exactly-once file
    output: restarted queries resume from the checkpoint, never rewriting a
    committed micro-batch)."""
    writer = (
        result.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
