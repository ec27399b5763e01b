"""applyInPandasWithState sessionization ≡ batch sessionization oracle.

The stream is cut into micro-batches mid-session; the per-user state
(last_ts, seq) must carry across triggers so session ordinals match the
batch window-function formulation exactly.
"""

from __future__ import annotations

import os
import time

import duckdb
import pytest

from pypgoutput_spark.operators.analytics import sessionize_sql
from pypgoutput_spark.functions.detsql import DUCKDB
from pypgoutput_spark.streaming.stateful import sessionize_stream

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="testdata sf0.001 missing"
)


def test_stateful_sessionize_matches_batch_oracle(spark, tmp_path):
    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    mid = events.agg({"event_id": "max"}).collect()[0][0] // 2
    src = str(tmp_path / "stream_src")
    # two files cut mid-stream (mid-session for many users), landed in
    # event order with distinct mod times so the file source keeps order
    events.filter(f"event_id <= {mid}").coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    events.filter(f"event_id > {mid}").coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sessions = sessionize_stream(stream, gap_minutes=30)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = (
        spark.table("sess_out")
        .toPandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{os.path.join(SF_DIR, 'events.parquet')}')"
    )
    # per-event expected ordinal from the batch oracle's building blocks
    want = con.execute("""
WITH ordered AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id) AS prev
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN prev IS NULL OR ts_us - prev > 1800000000 THEN 1 ELSE 0 END AS ns
  FROM ordered
)
SELECT user_id, event_id, ts_us,
  CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY event_id
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
FROM flagged
ORDER BY user_id, event_id
""").fetchdf().reset_index(drop=True)

    assert len(got) == len(want) and len(got) > 0
    for c in ("user_id", "event_id", "ts_us", "session_seq"):
        assert got[c].tolist() == want[c].tolist(), f"column {c}"
    # the cut really split sessions: some users have events in both halves
    n_split = con.execute(f"""
SELECT count(*) FROM (
  SELECT user_id FROM events GROUP BY user_id
  HAVING min(event_id) <= {mid} AND max(event_id) > {mid})
""").fetchone()[0]
    assert n_split > 0
