"""Streaming exact deduplication with watermark-bounded state.

The transport guard for at-least-once delivery: a CDC receiver that
re-delivers a spool chunk after a reconnect (or any event bus with
at-least-once semantics) hands the pipeline duplicate events; this
operator drops re-deliveries by key while keeping state BOUNDED — the
watermark evicts a key's dedup state once no duplicate can still
legally arrive.

Entirely built-in (`withWatermark` + `dropDuplicatesWithinWatermark`):
JVM-side keyed state store, no Python in the hot path. At 100 TB the
state size is ∝ keys seen within one watermark horizon — not the
stream's history — which is the only shape that survives an unbounded
stream. (The unwatermarked `dropDuplicates` keeps every key forever;
at CDC volumes that state store is a slow-motion OOM.)

Contract (pinned by tests/test_streaming_dedup.py):
  - duplicates arriving within the watermark horizon of the first
    occurrence are dropped — output ≡ batch `dropDuplicates` over the
    same data;
  - after the watermark passes an occurrence's eviction point, the
    key's state is reclaimed; a much-later re-delivery of the same key
    would re-emit. That is the documented bounded-state trade: the
    horizon must cover the transport's maximum re-delivery lag (a
    redelivered chunk arrives seconds-to-minutes later, not days).

Reference anchor: the reference's consumer relies on LSN-monotone
delivery from a single socket (reader.py:334-390) and never needs this;
a distributed, multi-source ingest does.
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401  (kept for parity with sibling modules)


def dedup_stream(events_stream, key_cols=("event_id",), ts_col: str = "ts",
                 watermark_minutes: int = 15):
    """Streaming side: first arrival per key passes; re-deliveries within
    the watermark horizon are dropped; state evicts with the watermark."""
    return (
        events_stream.withWatermark(ts_col, f"{watermark_minutes} minutes")
        .dropDuplicatesWithinWatermark(list(key_cols))
    )


def dedup_batch(events_df, key_cols=("event_id",)):
    """The batch oracle: plain dropDuplicates over the same rows (valid
    when all duplicates fall within one watermark horizon)."""
    return events_df.dropDuplicates(list(key_cols))
