"""Receiver seam: live producer → spool → receiver → stream_ingest.

The reference's ``consume_stream`` loop (reader.py:334-390) is a process
that tails the replication socket, pipes frames onward, and acks the
flush LSN. These tests pin the sandbox analog end to end: byte parity of
the Spark-free producer with the Spark generator, spool/receiver
mechanics (segment-aligned landing, ack, restart), and a genuinely
concurrent run — producer subprocess, receiver thread, and the Spark
stream all live at once — matching the serial oracle.
"""

from __future__ import annotations

import os
import subprocess
import sys
import threading
import time

import duckdb

from pypgoutput_spark.lake.table import LakeTable
from pypgoutput_spark.sources.receiver import (
    FrameReceiver,
    SpoolWriter,
    encode_frames_pdf,
)
from pypgoutput_spark.streaming import pipeline
from pypgoutput_spark.wal import generator as gen


import pytest


@pytest.mark.parametrize("p", [
    gen.GenParams(n_txns=20, ops_per_txn=5, toast_pct=30,
                  txns_per_segment=5, key_change_pct=10),
    gen.GenParams(n_txns=20, ops_per_txn=5, toast_pct=25,
                  txns_per_segment=5, stream_pct=40, stream_abort_pct=30),
    gen.GenParams(n_txns=24, ops_per_txn=5, toast_pct=25,
                  txns_per_segment=6, stream_pct=60, stream_abort_pct=30,
                  interleave_streams=True),
])
def test_live_frames_byte_parity(spark, p):
    """The DuckDB+pandas producer emits byte-identical frames to the
    Spark generator (protocol-v2 streamed txns included) — the oracle
    SQL therefore replays the live stream."""
    want = {
        (r["segment"], r["lsn"]): (r["mtype"], bytes(r["payload"]))
        for r in gen.spark_frames_df(spark, p).collect()
    }
    live = encode_frames_pdf(p, include_relation=True)
    got = {
        (int(s), int(l)): (m, bytes(pl))
        for s, l, m, pl in zip(live["segment"], live["lsn"],
                               live["mtype"], live["payload"])
    }
    assert got == want


def test_spool_receiver_roundtrip(tmp_path):
    """Spool chunks land as whole-segment parquet files; the ack tracks
    the flush LSN; a restarted receiver re-parses without re-landing."""
    import pyarrow.parquet as pq

    p = gen.GenParams(n_txns=20, ops_per_txn=4, txns_per_segment=5)
    spool, frames_dir = str(tmp_path / "spool"), str(tmp_path / "frames")
    w = SpoolWriter(spool)
    for lo in range(0, p.n_txns, 7):  # chunks deliberately cross segments
        w.write_chunk(encode_frames_pdf(p, lo, lo + 7, include_relation=(lo == 0)))
    w.finish()

    r = FrameReceiver(spool, frames_dir)
    r.run(poll_interval=0.01)
    seg_files = sorted(f for f in os.listdir(frames_dir) if f.endswith(".parquet"))
    assert len(seg_files) == 4  # 20 txns / 5 per segment
    # whole segments per file, LSN-sorted
    t0 = pq.read_table(os.path.join(frames_dir, seg_files[0]))
    assert set(t0["segment"].to_pylist()) == {0}
    lsns = t0["lsn"].to_pylist()
    assert lsns == sorted(lsns)
    # every frame landed exactly once; ack = global max lsn
    all_frames = sum(
        pq.read_table(os.path.join(frames_dir, f)).num_rows for f in seg_files
    )
    stride = p.lsn_stride
    expect_max = 10 + (p.n_txns - 1) * stride + p.ops_per_txn + 1
    assert all_frames == p.n_txns * (p.ops_per_txn + 2) + 1  # + R frame
    assert r.flush_lsn == expect_max
    with open(os.path.join(frames_dir, "_ack")) as f:
        assert int(f.read()) == expect_max

    # restart: chunks re-parse, nothing re-lands (idempotent)
    r2 = FrameReceiver(spool, frames_dir)
    r2.run(poll_interval=0.01)
    assert sorted(
        f for f in os.listdir(frames_dir) if f.endswith(".parquet")
    ) == seg_files


@pytest.mark.parametrize("p", [
    gen.GenParams(n_txns=60, ops_per_txn=6, toast_pct=30, txns_per_segment=5),
    # protocol-v2 with interleaved chunk pairs through the WHOLE live
    # path: producer subprocess -> spool -> receiver -> stream decode
    gen.GenParams(n_txns=60, ops_per_txn=6, toast_pct=30, txns_per_segment=6,
                  stream_pct=50, stream_abort_pct=25, interleave_streams=True),
], ids=["serial", "interleaved_v2"])
def test_live_e2e_concurrent(spark, tmp_path, p):
    """Producer subprocess, receiver thread, and the Spark stream run
    CONCURRENTLY; the final table state equals the serial DuckDB oracle.
    The receiver's whole-segment files enable clustered=True (zero
    decode shuffle)."""
    spool = str(tmp_path / "spool")
    frames_dir = str(tmp_path / "frames")
    os.makedirs(frames_dir, exist_ok=True)

    cmd = [
        sys.executable, os.path.join(os.path.dirname(__file__), "..", "tools", "live_source.py"),
        "--spool", spool, "--n-txns", str(p.n_txns),
        "--ops-per-txn", str(p.ops_per_txn),
        "--txns-per-segment", str(p.txns_per_segment),
        "--toast-pct", str(p.toast_pct),
        "--chunk-txns", "8", "--sleep-ms", "150",
    ]
    if p.stream_pct:
        cmd += ["--stream-pct", str(p.stream_pct),
                "--stream-abort-pct", str(p.stream_abort_pct)]
        if p.interleave_streams:
            cmd += ["--interleave-streams"]
    producer = subprocess.Popen(
        cmd, cwd=os.path.join(os.path.dirname(__file__), ".."),
    )
    receiver = FrameReceiver(spool, frames_dir)
    stop = threading.Event()
    rthread = threading.Thread(target=receiver.run, kwargs={"poll_interval": 0.05, "stop": stop})
    rthread.start()

    table = LakeTable.create(
        spark, str(tmp_path / "lake"),
        schema=[(c, "string") for c in gen.ALL_COLUMNS],
        key_cols=list(gen.KEY_COLUMNS), n_buckets=8,
    )
    q = pipeline.stream_ingest(
        spark, frames_dir, table, str(tmp_path / "ckpt"),
        max_files_per_trigger=2, trigger={"processingTime": "1 second"},
        clustered=True,
    )
    # final frame LSN from the (Spark-free) frame layout itself — the
    # closed form differs per layout (serial C at ops+1, streamed c/A at
    # ops+2, interleaved pair tail at 2*ops+9 inside the pair window)
    max_lsn = int(encode_frames_pdf(p)["lsn"].max())
    try:
        deadline = time.time() + 240
        while table.watermark_lsn < max_lsn and time.time() < deadline:
            time.sleep(1)
    finally:
        q.stop()
        stop.set()
        rthread.join(timeout=30)
        producer.wait(timeout=30)

    assert producer.returncode == 0
    assert receiver.flush_lsn == max_lsn, "receiver acked the full stream"
    assert table.watermark_lsn == max_lsn, "stream applied through the ack"
    got = table.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    want = (
        duckdb.sql(gen.duckdb_final_state_sql(p, with_sha=False))
        .df().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert got[want.columns.tolist()].equals(want)


def test_receiver_tolerates_spool_truncation(tmp_path):
    """The producer may delete acked chunks (the module contract); the
    receiver tracks consumption by chunk SEQUENCE, so truncation never
    shifts it past unread chunks."""
    import os

    import pyarrow.parquet as pq

    p = gen.GenParams(n_txns=20, ops_per_txn=4, txns_per_segment=5)
    spool, frames_dir = str(tmp_path / "spool"), str(tmp_path / "frames")
    w = SpoolWriter(spool)
    for lo in range(0, 12, 4):
        w.write_chunk(encode_frames_pdf(p, lo, lo + 4, include_relation=(lo == 0)))
    r = FrameReceiver(spool, frames_dir)
    r.poll_once()
    # producer truncates the acked prefix, then appends the rest
    for name in sorted(os.listdir(spool)):
        if name in ("chunk-00000000.bin", "chunk-00000001.bin"):
            os.remove(os.path.join(spool, name))
    for lo in range(12, p.n_txns, 4):
        w.write_chunk(encode_frames_pdf(p, lo, lo + 4))
    w.finish()
    r.run(poll_interval=0.01)
    seg_files = sorted(f for f in os.listdir(frames_dir) if f.endswith(".parquet"))
    assert len(seg_files) == 4
    total = sum(
        pq.read_table(os.path.join(frames_dir, f)).num_rows for f in seg_files
    )
    assert total == p.n_txns * (p.ops_per_txn + 2) + 1


def test_receiver_stop_never_lands_partial_segments(tmp_path):
    """A stopped-early receiver leaves open segment buffers UNLANDED
    (landing a partial segment would make the restart skip its replay
    and lose the tail); a restarted receiver replays it whole."""
    import os
    import threading

    import pyarrow.parquet as pq

    p = gen.GenParams(n_txns=10, ops_per_txn=4, txns_per_segment=5)
    spool, frames_dir = str(tmp_path / "spool"), str(tmp_path / "frames")
    w = SpoolWriter(spool)
    # chunk covering segment 0 + HALF of segment 1, no DONE yet
    w.write_chunk(encode_frames_pdf(p, 0, 7, include_relation=True))

    r = FrameReceiver(spool, frames_dir)
    stop = threading.Event()
    stop.set()
    r.poll_once()
    r.run(poll_interval=0.01, stop=stop)  # exits immediately, no finish()
    seg_files = sorted(f for f in os.listdir(frames_dir) if f.endswith(".parquet"))
    assert seg_files == ["seg-00000000.parquet"], "open segment 1 must NOT land"

    # producer completes; a fresh receiver replays and lands segment 1 whole
    w.write_chunk(encode_frames_pdf(p, 7, p.n_txns))
    w.finish()
    r2 = FrameReceiver(spool, frames_dir)
    r2.run(poll_interval=0.01)
    t1 = pq.read_table(os.path.join(frames_dir, "seg-00000001.parquet"))
    assert t1.num_rows == 5 * (p.ops_per_txn + 2), "segment 1 landed whole"
