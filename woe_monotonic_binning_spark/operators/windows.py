"""Time-window aggregations over the events stream table.

Batch forms here; ``streaming/events.py`` holds the watermarked streaming
twins built from the same column expressions, so batch results double as
the oracle for the streaming path.

Scale notes: tumbling/sliding aggregations shuffle once on (window, keys);
the session window is Spark's native ``session_window`` (state merges in
the agg).  ``top_users_per_window`` demonstrates the two-level pattern —
pre-aggregate per (window, user) BEFORE ranking, so the window function
sees one row per user, not one per event.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def tumbling_agg(events: DataFrame, width: str = "1 hour") -> DataFrame:
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
            "approx_users",
        )
    )


def tumbling_agg_exact(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """``tumbling_agg`` with EXACT distinct users — the oracle-checkable
    form (approx_count_distinct is sketch-dependent and can never
    hash-match); the certified catalog suite and its demoted single-slot
    twin both build on this."""
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
            "n_users",
        )
    )


def sliding_agg(events: DataFrame, width: str = "1 hour", slide: str = "30 minutes") -> DataFrame:
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def session_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user sessions separated by >= ``gap`` of inactivity."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("total_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


def top_users_per_window(events: DataFrame, width: str = "1 day", k: int = 5) -> DataFrame:
    """Top-k users by event count per window — pre-agg then rank."""
    per_user = events.groupBy(F.window("ts", width).alias("w"), "user_id").agg(
        F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("total_value")
    )
    w = Window.partitionBy("w").orderBy(
        F.col("n_events").desc(), F.col("user_id")
    )
    return (
        per_user.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("w.start").alias("window_start"),
            "user_id",
            "n_events",
            "total_value",
            "rank",
        )
    )


def event_rollup(events: DataFrame) -> DataFrame:
    """ROLLUP (event_type, day): subtotal rows carry NULL group keys —
    grouping-set coverage the reference lacks (SURVEY section 2 notes).

    ``grouping_id`` disambiguates a SUBTOTAL row's NULL key from a
    genuine NULL ``event_type`` value (0 = data row, 1 = day subtotal,
    3 = grand total) — without it a consumer summing ``n_events`` over a
    corpus with NULL event types double-counts with no way to tell the
    rows apart (round-8 review)."""
    return (
        events.withColumn("day", F.to_date("ts"))
        .rollup("event_type", "day")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
            F.grouping_id().alias("grouping_id"),
        )
    )
