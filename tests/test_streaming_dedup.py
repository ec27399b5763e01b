"""Watermark-bounded streaming dedup: re-delivered events are dropped
within the watermark horizon (output ≡ batch dropDuplicates), and the
keyed state is evicted once the watermark passes — the bounded-state
contract that makes dedup viable on an unbounded CDC stream."""

from __future__ import annotations

import datetime as dt
import time

from pypgoutput_spark.streaming.dedup import dedup_batch, dedup_stream

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
SCHEMA = "event_id BIGINT, ts TIMESTAMP, event_type STRING, value DOUBLE"


def _ev(eid, minutes, etype="click", value=1.5):
    return (eid, T0 + dt.timedelta(minutes=minutes), etype, value)


def _run_stream(spark, tmp_path, files, watermark_minutes=15):
    src = str(tmp_path / "src")
    for rows in files:
        spark.createDataFrame(rows, schema=SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)  # distinct mod times keep file-source order
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        dedup_stream(stream, watermark_minutes=watermark_minutes)
        .writeStream.format("memory").queryName("dedup_sink")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    return spark.sql("SELECT * FROM dedup_sink").collect()


def test_stream_dedup_matches_batch_within_horizon(spark, tmp_path):
    """Re-delivered copies (byte-identical, the transport-redelivery
    shape) in the same and later files — all within the watermark
    horizon — are dropped: exactly one copy per key survives, and the
    output set equals the batch dropDuplicates oracle."""
    originals = [_ev(i, i % 12, value=float(i)) for i in range(30)]
    redelivered = [originals[i] for i in range(0, 30, 3)]
    files = [
        originals[:15] + redelivered[:2],     # in-file duplicate
        redelivered[2:6] + originals[15:],    # cross-file duplicates
        redelivered[6:],
    ]
    out = _run_stream(spark, tmp_path, files)
    assert sorted(r["event_id"] for r in out) == list(range(30))
    batch = dedup_batch(
        spark.createDataFrame(originals, schema=SCHEMA)
    ).collect()
    assert {(r["event_id"], r["ts"], r["value"]) for r in out} == {
        (r["event_id"], r["ts"], r["value"]) for r in batch
    }


def test_stream_dedup_state_evicts_after_watermark(spark, tmp_path):
    """The bounded-state contract, both directions. File 2 advances the
    watermark far past e0's eviction point; file 3 (its trigger uses the
    batch-lagged watermark from file 2) re-delivers key 0 with a fresh
    timestamp — the state was evicted, so it re-emits. A transport must
    therefore bound re-delivery lag by the horizon; in exchange the
    state store holds only one horizon of keys, ever."""
    files = [
        [_ev(0, 0), _ev(1, 1)],
        [_ev(2, 300)],            # watermark → ~285 min, far past e0+15
        [_ev(3, 302)],            # watermark updates LAG one batch — this
                                  # intervening batch makes 285 effective
        [_ev(0, 303, value=7.0)],  # same key, fresh ts, post-eviction
    ]
    out = _run_stream(spark, tmp_path, files, watermark_minutes=15)
    by_key = {}
    for r in out:
        by_key.setdefault(r["event_id"], []).append(r)
    assert len(by_key[1]) == 1 and len(by_key[2]) == 1 and len(by_key[3]) == 1
    assert len(by_key[0]) == 2, (
        "evicted key must re-emit — if this starts failing, the state "
        "outlived the watermark horizon (unbounded state)"
    )
