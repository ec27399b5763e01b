"""Stream-stream watermarked interval join: emitted pairs ≡ the batch
join, each exactly once — the state-bounded attribution join."""

from __future__ import annotations

import datetime as dt
import time

from pypgoutput_spark.streaming.joins import (
    interval_join_batch,
    interval_join_stream,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
L_SCHEMA = "imp_id BIGINT, l_ts TIMESTAMP, l_user_id BIGINT"
R_SCHEMA = "clk_id BIGINT, r_ts TIMESTAMP, r_user_id BIGINT"


def _t(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def _write_files(spark, path, schema, files):
    for rows in files:
        spark.createDataFrame(rows, schema=schema).coalesce(1).write.mode(
            "append"
        ).parquet(path)
        time.sleep(1.1)


def test_stream_interval_join_matches_batch(spark, tmp_path):
    # impressions: users 0..9, two impressions each, 6 min apart
    imps = [(u * 10 + i, _t(u + 6 * i), u) for u in range(10) for i in range(2)]
    # clicks: some in-window (0-10 min after an impression), some outside,
    # some for users with no impression
    clks = (
        [(100 + u, _t(u + 3), u) for u in range(0, 10, 2)]       # in-window
        + [(200 + u, _t(u + 30), u) for u in range(0, 10, 3)]    # too late
        + [(300 + u, _t(u), u + 50) for u in range(3)]           # no imp
    )
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    _write_files(spark, lsrc, L_SCHEMA, [imps[:10], imps[10:]])
    _write_files(spark, rsrc, R_SCHEMA, [clks[:8], clks[8:]])
    lstream = spark.readStream.schema(L_SCHEMA).parquet(lsrc)
    rstream = spark.readStream.schema(R_SCHEMA).parquet(rsrc)
    q = (
        interval_join_stream(lstream, rstream)
        .writeStream.format("memory").queryName("join_sink")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT imp_id, clk_id FROM join_sink").collect()
    got = sorted((r["imp_id"], r["clk_id"]) for r in out)
    assert len(got) == len(set(got)), "pair emitted more than once"
    batch = interval_join_batch(
        spark.createDataFrame(imps, schema=L_SCHEMA),
        spark.createDataFrame(clks, schema=R_SCHEMA),
    ).select("imp_id", "clk_id").collect()
    want = sorted((r["imp_id"], r["clk_id"]) for r in batch)
    assert got == want and want, "stream join must equal batch join (non-empty)"
