"""Watermarked event-time windowed aggregation (built-in operators).

The standard Structured-Streaming shape for unbounded event analytics:
tumbling event-time windows + a watermark bounding how late data may
arrive. Everything here is built-in (`withWatermark` + `window()` +
hash aggregate) — no Python in the hot path, state is the window
aggregate store partitioned by (window, key), and append mode emits
each window exactly once, when the watermark passes its end.

Semantics (pinned by tests/test_windowed_streaming.py):
  - events later than the watermark are DROPPED from their (already
    finalized) window — the bounded-lateness contract that lets state
    be reclaimed; at 100 TB this is what keeps the window state store
    from growing without bound;
  - events late but within the watermark still land in their window
    (the window is not finalized until the watermark passes);
  - emitted windows are byte-identical to the batch aggregation over
    the same (on-time) data — the batch groupBy(window(...)) is the
    correctness oracle.

The sum uses the repo's exact-decimal discipline (DECIMAL accumulate,
DOUBLE emit) so streamed and batch sums agree bit-for-bit regardless of
accumulation order.
"""

from __future__ import annotations

from pyspark.sql import functions as F

OUT_COLS = ("win_start", "win_end", "event_type", "n_events", "sum_value")


def _out_select():
    """The shared output projection — OUT_COLS is the schema contract."""
    return [
        F.col("window.start").alias(OUT_COLS[0]),
        F.col("window.end").alias(OUT_COLS[1]),
        *OUT_COLS[2:],
    ]


def _agg(grouped):
    return grouped.agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(28,10)"))
        .cast("double")
        .alias("sum_value"),
    )


def windowed_counts_stream(events_stream, window_minutes: int = 10,
                           watermark_minutes: int = 15):
    """events (ts, event_type, value) stream → finalized per-window
    per-type counts/sums, append mode (one row per window, emitted when
    the watermark passes the window end)."""
    win = _agg(
        events_stream.withWatermark("ts", f"{watermark_minutes} minutes")
        .groupBy(
            F.window("ts", f"{window_minutes} minutes"), "event_type"
        )
    )
    return win.select(*_out_select())


def windowed_counts_batch(events_df, window_minutes: int = 10):
    """The batch oracle: same aggregation over a static DataFrame."""
    win = _agg(
        events_df.groupBy(F.window("ts", f"{window_minutes} minutes"), "event_type")
    )
    return win.select(*_out_select())
