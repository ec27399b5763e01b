"""Watermarked windowed aggregation: streamed finalized windows ≡ the
batch aggregation, and the bounded-lateness contract (too-late events
dropped from finalized windows; late-but-within-watermark kept)."""

from __future__ import annotations

import datetime as dt
import time

from pypgoutput_spark.streaming.windowed import (
    windowed_counts_batch,
    windowed_counts_stream,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
SCHEMA = "event_id BIGINT, ts TIMESTAMP, event_type STRING, value DOUBLE"


def _ev(eid, minutes, etype="click", value=1.5):
    return (eid, T0 + dt.timedelta(minutes=minutes), etype, value)


def _run_stream_rows(spark, tmp_path, files, window_minutes=10, watermark_minutes=15):
    src = str(tmp_path / "src")
    for i, rows in enumerate(files):
        df = spark.createDataFrame(rows, schema=SCHEMA)
        df.coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)  # distinct mod times keep file-source order
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        windowed_counts_stream(stream, window_minutes, watermark_minutes)
        .writeStream.format("memory").queryName("win_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql("SELECT * FROM win_sink").collect()


def test_streamed_windows_match_batch(spark, tmp_path):
    """Three in-order files cut across window boundaries; every emitted
    (finalized) window is byte-identical to the batch aggregation row,
    and all windows the final watermark passed are present."""
    rows = [
        _ev(i, m, t, v)
        for i, (m, t, v) in enumerate(
            [(m, t, 1.0 + m / 7.0)
             for m in range(0, 95, 3)
             for t in (("click",) if m % 2 else ("click", "view"))]
        )
    ]
    files = [rows[:20], rows[20:40], rows[40:]]
    out = _run_stream_rows(spark, tmp_path, files)
    got = {(r["win_start"], r["event_type"]): r for r in out}
    assert got and len(got) == len(out), "no windows, or duplicate emission"
    batch = {
        (r["win_start"], r["event_type"]): r
        for r in windowed_counts_batch(
            spark.createDataFrame(rows, schema=SCHEMA)
        ).collect()
    }
    for key, r in got.items():
        b = batch[key]
        assert (r["n_events"], r["sum_value"]) == (b["n_events"], b["sum_value"]), key
    # final watermark = max ts (94 min) - 15 min = 79 min: every window
    # ending at or before it must have been emitted
    done_end = 79
    expected = {k for k, b in batch.items()
                if (b["win_end"] - T0).total_seconds() / 60 <= done_end}
    assert expected <= set(got)


def test_watermark_drops_too_late_keeps_within(spark, tmp_path):
    """Bounded-lateness contract. Watermark emission/drop lags one
    batch (the watermark used in batch N derives from batches < N), so
    the fixture interposes a batch: file 1 sets the watermark past
    window [0,10); file 2's batch runs with that watermark and EMITS
    [0,10), evicting its state; file 3 then delivers an event 95
    minutes late — its window is gone, the row is dropped (no duplicate
    append row, no count change) — plus an event only 7 minutes behind
    the watermark, which lands in its still-open window."""
    f1 = [_ev(0, 2), _ev(1, 4),          # window [0,10)
          _ev(2, 52),                     # window [50,60)
          _ev(3, 100)]                    # -> watermark 85 after this batch
    f2 = [_ev(4, 105), _ev(8, 95)]       # batch runs at wm 85: [0,10) emits
    f3 = [_ev(5, 5),                      # 95 min late -> window evicted: DROPPED
          _ev(6, 93),                     # within watermark (wm 90) -> KEPT
          _ev(7, 130)]                    # -> wm 115 finalizes [90,100)
    rows = _run_stream_rows(spark, tmp_path, [f1, f2, f3])
    w0 = [r for r in rows if (r["win_start"], r["event_type"]) == (T0, "click")]
    assert len(w0) == 1, "a dropped late row must not re-emit its window"
    assert w0[0]["n_events"] == 2, "late event must NOT reopen a finalized window"
    w90 = [r for r in rows
           if r["win_start"] == T0 + dt.timedelta(minutes=90)]
    assert len(w90) == 1 and w90[0]["n_events"] == 2, \
        "within-watermark late event must be kept"
