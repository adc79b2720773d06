"""Streaming event-time sessionization — session_window + watermark.

SURVEY ST12: the batch sessionizers (q24's LAG + cumulative-sum, q56's
``session_window``) had no streaming counterpart.  Structured
Streaming runs the SAME ``session_window`` expression with bounded
state: a user's sessions MERGE across micro-batches while new events
land inside the gap, and the watermark plays both roles — it finalizes
sessions (append mode emits a session only once no on-time event can
extend it, i.e. the watermark passes session end) and drops late data
— so state is bounded by the active-session horizon, never the
stream's history.

Scale shape: state is one (user, open-session) entry keyed by the
grouping columns; eviction is watermark-driven.  The output contract
matches the batch q56 surface, so a finalized streaming session equals
the batch ``session_window`` aggregate over the same on-time events
(asserted in tests/test_session_stream.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_sessions(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sessionize a watermarked event stream: one output row per
    finalized (user, session) with start/end/duration/event count."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(user_col), F.session_window(F.col(ts_col), gap).alias("w")
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            user_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            (F.col("w.end").cast("long") - F.col("w.start").cast("long")).alias(
                "duration_s"
            ),
            F.col("n_events").cast("long").alias("n_events"),
        )
    )
