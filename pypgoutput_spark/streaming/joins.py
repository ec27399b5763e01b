"""Watermarked stream-stream interval join (built-in operators).

The attribution shape: join two unbounded streams (impressions ×
conversions, orders × shipments, CDC events × enrichment feed) on a key
with the right event constrained to a bounded time interval after the
left one. Structured Streaming supports this natively when BOTH sides
carry watermarks and the join condition bounds event time — that bound
is what lets the state store evict: each side buffers only the rows
still joinable under the other side's watermark, so state is
∝ (rate × interval), never stream history. At 100 TB/day that bound is
the difference between a join and an OOM.

Both sides shuffle-partition by the join key (one Exchange each); the
interval predicate is evaluated post-match, JVM-side. No Python in the
hot path.

Contract (pinned by tests/test_streaming_joins.py):
  - emitted pairs ≡ the batch join with the same predicate over the
    same data;
  - inner join, append mode: a pair emits once, when both sides have
    arrived and neither can be superseded.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def interval_join_stream(left_stream, right_stream, key: str = "user_id",
                         left_ts: str = "l_ts", right_ts: str = "r_ts",
                         within_minutes: int = 10,
                         watermark_minutes: int = 15):
    """Rows of ``left`` matched with ``right`` rows of the same ``key``
    whose ``right_ts`` falls in [left_ts, left_ts + within_minutes].

    Column contract: ALL joined columns must be disjoint across the two
    streams — the key is read as ``l_<key>`` on the left and ``r_<key>``
    on the right (so ``key="user_id"`` requires ``l_user_id`` /
    ``r_user_id``), and the timestamp column names are caller-chosen but
    must differ."""
    lw = left_stream.withWatermark(left_ts, f"{watermark_minutes} minutes")
    rw = right_stream.withWatermark(right_ts, f"{watermark_minutes} minutes")
    return lw.join(rw, _cond(key, left_ts, right_ts, within_minutes), "inner")


def interval_join_batch(left_df, right_df, key: str = "user_id",
                        left_ts: str = "l_ts", right_ts: str = "r_ts",
                        within_minutes: int = 10):
    """The batch oracle: identical predicate over static inputs."""
    return left_df.join(right_df, _cond(key, left_ts, right_ts, within_minutes), "inner")


def _cond(key, left_ts, right_ts, within_minutes):
    return (
        (F.col(f"l_{key}") == F.col(f"r_{key}"))
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {within_minutes} MINUTES"))
    )
