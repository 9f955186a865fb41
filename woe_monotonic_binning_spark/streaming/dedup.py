"""Streaming exact deduplication — the ingest-time twin of
``operators/dedup.exact_dedup``.

A training-data ingest pipeline dedups AT ARRIVAL, not in a nightly batch:
the first copy of a document flows through, later copies are dropped.  Two
state regimes, both JVM-side (no Python in the stream):

- ``streaming_exact_dedup`` — ``dropDuplicatesWithinWatermark``: state is
  bounded by the watermark horizon (keys older than the event-time watermark
  are evicted), so a perpetual stream holds only the recent-key set.  A
  duplicate arriving AFTER the horizon is re-emitted — the right trade for
  100 TB/day ingest, where the unbounded alternative OOMs state storage and
  cross-horizon dups are cheap to sweep in a periodic batch
  (``exact_dedup``) anyway.
- ``streaming_exact_dedup_unbounded`` — plain ``dropDuplicates``: exact
  global dedup, state grows with the distinct-key count.  Only for bounded
  backfills (``availableNow`` replays) or low-cardinality keys.

Both emit in append mode: each key's FIRST arrival is emitted exactly once,
which is what a downstream writer wants (no retractions).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def streaming_exact_dedup(
    stream: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First-arrival-wins exact dedup with watermark-bounded state.

    For wide text keys pass a digest column (``sha2(text, 256)``) as the
    key instead of raw text — the dedup state then stores 32-byte digests,
    the same shuffle-narrowing trick as the batch digest path
    (operators/dedup.py ``exact_dedup_by_digest``).
    """
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def streaming_exact_dedup_unbounded(
    stream: DataFrame, key_cols: Sequence[str]
) -> DataFrame:
    """Exact global streaming dedup; state is the full distinct-key set —
    bounded backfills only (see module docstring)."""
    return stream.dropDuplicates(list(key_cols))


def streaming_dedup_against_store(
    stream: DataFrame,
    store_path: str,
    out_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    checkpoint_dir: str | None = None,
):
    """Ingest-time exact dedup against a PERSISTENT digest store — the
    streaming face of ``operators/dedup.dedup_against_reference``: each
    micro-batch drops documents whose content digest already exists in the
    parquet store at ``store_path`` (or earlier in the same batch), appends
    the survivors to ``out_path`` and their digests back to the store.

    Unlike ``streaming_exact_dedup`` the state here survives query
    restarts and watermark horizons: it IS the corpus digest table, the
    same one the nightly batch path reads/writes, so batch backfills and
    the live stream dedup against one shared fact set.  State per document
    is one 64-hex-char digest row — at 100 TB you partition the store by
    digest prefix and the per-batch anti-join shuffles digests only (AQE
    broadcasts small batches).

    Delivery: ``foreachBatch`` + checkpoint gives at-least-once batch
    replay; a replayed batch re-appends digests (harmless — the store is
    semantically a set and the anti-join ignores multiplicity) but can
    also re-append SURVIVOR rows to ``out_path``.  Production sinks want a
    transactional table format (Delta/Iceberg MERGE) for exactly-once
    output; plain parquet keeps this container-runnable and the semantics
    honest.  Returns the started StreamingQuery (availableNow trigger —
    call ``awaitTermination()``)."""

    def _process(batch_df: DataFrame, _batch_id: int) -> None:
        from ..operators.dedup import dedup_against_reference

        from pyspark.errors import AnalysisException

        spark = batch_df.sparkSession
        try:
            ref = spark.read.parquet(store_path).select("digest")
        except AnalysisException:  # first batch: store does not exist yet
            # Deliberately NARROW: an unreadable/corrupt store must raise,
            # not silently restart dedup from an empty digest set.
            ref = spark.createDataFrame([], "digest string")
        fresh = dedup_against_reference(batch_df, ref, text_col, id_col).persist()
        fresh.write.mode("append").parquet(out_path)
        fresh.select(
            F.sha2(F.col(text_col).cast("binary"), 256).alias("digest")
        ).write.mode("append").parquet(store_path)
        fresh.unpersist()

    writer = stream.writeStream.foreachBatch(_process).trigger(availableNow=True)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
