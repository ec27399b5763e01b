"""Custom stateful streaming operators (applyInPandasWithState).

Gap-based sessionization over an unbounded event stream, keyed by user:
the per-user state (last event timestamp, current session ordinal) lives
in the state store and survives micro-batch boundaries, so a session
that spans many triggers numbers identically to the batch operator
(operators.analytics.sessionize_sql — the correctness oracle).

Delivery contract: events arrive per-user in event_id order across
micro-batches (a CDC-fed stream in commit order does); within one
micro-batch the kernel sorts, across batches the state carries
(last_ts_us, next_seq). This is the ``applyInPandasWithState`` shape a
100 TB pipeline uses for custom stateful ops the built-in windowed
aggregations can't express: state is partitioned by key (scales with
executors), each key's state is O(1), and the kernel sees Arrow batches.
"""

from __future__ import annotations

OUTPUT_SCHEMA = "user_id BIGINT, event_id BIGINT, ts_us BIGINT, session_seq BIGINT"
STATE_SCHEMA = "last_ts_us BIGINT, seq BIGINT"


def _session_fn(gap_us: int):
    def fn(key, pdf_iter, state):
        import pandas as pd

        (user_id,) = key
        if state.exists:
            last_ts, seq = state.get
        else:
            last_ts, seq = None, 0
        rows = {"user_id": [], "event_id": [], "ts_us": [], "session_seq": []}
        for pdf in pdf_iter:
            pdf = pdf.sort_values("event_id")
            for eid, ts_us in zip(pdf["event_id"].values, pdf["ts_us"].values):
                ts_us = int(ts_us)
                if last_ts is None or ts_us - last_ts > gap_us:
                    seq += 1
                last_ts = ts_us
                rows["user_id"].append(int(user_id))
                rows["event_id"].append(int(eid))
                rows["ts_us"].append(ts_us)
                rows["session_seq"].append(int(seq))
        state.update((last_ts, seq))
        if rows["user_id"]:
            yield pd.DataFrame(rows)

    return fn


def sessionize_stream(events_stream, gap_minutes: int = 30):
    """events (user_id, event_id, ts) stream → per-event session ordinal.

    Returns a streaming DataFrame; session_seq matches the batch
    sessionization (analytics.sessionize_sql) when events arrive per-user
    in event_id order.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    prepared = events_stream.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_minutes * 60 * 1_000_000),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
