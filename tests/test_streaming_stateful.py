"""Stateful streaming sessionization vs its batch twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from woe_monotonic_binning_spark.operators.windows import session_agg
from woe_monotonic_binning_spark.sources.tables import load_table, microsecond_parquet_copy
from woe_monotonic_binning_spark.streaming.events import read_events_stream
from woe_monotonic_binning_spark.streaming.stateful import (
    run_append_available_now,
    sessionize_stream,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_path():
    return microsecond_parquet_copy(SF, "events")


def _keyed(df, start_col="session_start"):
    return df.select(
        "user_id",
        F.date_format(start_col, "yyyy-MM-dd HH:mm:ss").alias("ss"),
        "n_events",
        F.round("total_value", 6).alias("tv"),
    )


def test_stream_sessions_match_batch(spark, events_path):
    stream = read_events_stream(spark, events_path)
    out = run_append_available_now(sessionize_stream(stream), "t_sessions").cache()
    batch = session_agg(load_table(spark, SF, "events")).cache()

    n_stream, n_batch = out.count(), batch.count()
    # every emitted session must exist in the batch result, value-identical
    matched = _keyed(out).join(_keyed(batch), ["user_id", "ss", "n_events", "tv"]).count()
    assert matched == n_stream
    # only sessions still inside the final watermark may be missing: those
    # whose timeout (last_event + gap) lies beyond max_ts - watermark_delay
    ev = load_table(spark, SF, "events")
    max_ts = ev.agg(F.max("ts")).first()[0]
    cutoff = F.lit(max_ts) - F.expr("INTERVAL 60 MINUTES")  # gap + watermark
    still_open = batch.filter(F.col("session_end") > cutoff).count()
    assert n_batch - n_stream <= still_open
    assert n_stream > 0.9 * n_batch


def test_terminal_event_splits_sessions(spark, events_path):
    ev = load_table(spark, SF, "events")
    etype = ev.groupBy("event_type").count().orderBy(F.desc("count")).first()[0]
    stream = read_events_stream(spark, events_path)
    out = run_append_available_now(
        sessionize_stream(stream, terminal_event=etype), "t_sessions_term"
    ).cache()
    by = {r["closed_by"]: r["count"] for r in out.groupBy("closed_by").count().collect()}
    assert by.get("terminal", 0) > 0
    # terminal sessions end ON a terminal event; total event coverage holds
    plain = run_append_available_now(
        sessionize_stream(read_events_stream(spark, events_path)), "t_sessions_plain"
    )
    assert out.agg(F.sum("n_events")).first()[0] >= plain.agg(F.sum("n_events")).first()[0]
