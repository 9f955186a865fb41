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
