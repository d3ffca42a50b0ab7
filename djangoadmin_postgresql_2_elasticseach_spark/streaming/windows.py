"""Windowed streaming aggregation with late-data handling over the
events stream — tumbling event-time windows + watermark.

The reference has no window semantics (SURVEY §2.5/§2.10: timestamps
are monotonic by construction in its ETL); this is the north-star
streaming counterpart of the batch `events_daily_counts` query, built
on the standard Structured Streaming primitives:

- `withWatermark(ts, delay)` bounds state: a window closes (and its
  row is emitted in append mode) once the watermark passes its end;
  events later than the delay are dropped — the explicit late-data
  contract.
- the window aggregate is partial-then-final like any groupBy: only
  per-partition partials shuffle, keyed by (window, event_type).

At scale the state store holds one row per (open window × event_type) —
bounded by the watermark horizon, independent of event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events_stream: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "15 minutes",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window event counts + value sums per event type.

    Output: (window_start, window_end, event_type, n_events, sum_value).
    Append-mode-compatible (watermarked); also runs on a batch frame
    (window() works identically — pinned by test against the batch
    daily-counts query).
    """
    return (
        events_stream.withWatermark(ts_col, watermark_delay)
        .groupBy(
            F.window(F.col(ts_col), window_duration).alias("w"),
            F.col(type_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col(type_col),
            "n_events",
            "sum_value",
        )
    )


def session_event_counts(
    events_stream: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str = "15 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Streaming sessionization via native session windows: events from
    one user merge while each arrives within ``gap`` of the session's
    end; the session closes (and emits, in append mode) once the
    watermark passes session_end.

    Boundary note vs the batch operator (relational.user_sessions):
    session_window starts a NEW session when the gap is ≥ `gap`; the
    batch gaps-and-islands splits only when strictly > — an
    exactly-on-the-boundary event lands differently. Both are
    deterministic; the difference is pinned in tests.

    State per (user, open session) is one merged window — bounded by the
    watermark horizon, merged incrementally by the state store (no
    per-event rows retained).
    """
    return (
        events_stream.withWatermark(ts_col, watermark_delay)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(user_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col(user_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
