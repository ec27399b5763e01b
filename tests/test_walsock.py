"""Streaming-replication wire protocol over a real socket
(sources/walsock.py): XLogData / keepalive / StatusUpdate byte framing,
capture-time mtype stamping, receiver-side safe-boundary segment
rolling, flush-LSN feedback — the ``consume_stream`` +
``send_feedback`` loop (reference reader.py:334-390) including the
FE/BE startup + START_REPLICATION phase — minus only the live
walsender itself.
"""

from __future__ import annotations

import os
import threading

import duckdb
import pytest

from pypgoutput_spark.lake.table import LakeTable
from pypgoutput_spark.sources.receiver import encode_frames_pdf
from pypgoutput_spark.sources.walsock import SocketWalReceiver, WalSocketServer
from pypgoutput_spark.streaming import pipeline
from pypgoutput_spark.wal import generator as gen


def _frames_and_meta(p):
    """(lsn, payload) pairs in LSN order + the generator's own
    (lsn -> mtype) map for the stamping-parity assertion."""
    pdf = encode_frames_pdf(p, include_relation=True)
    pdf = pdf.sort_values("lsn").reset_index(drop=True)
    frames = [(int(l), bytes(pl)) for l, pl in zip(pdf["lsn"], pdf["payload"])]
    mtypes = {int(l): m for l, m in zip(pdf["lsn"], pdf["mtype"])}
    return frames, mtypes


P_SOCK = gen.GenParams(n_txns=60, ops_per_txn=6, toast_pct=25,
                       txns_per_segment=6, stream_pct=40,
                       stream_abort_pct=25, key_change_pct=0)


def test_socket_stream_lands_and_matches_oracle(spark, tmp_path):
    """End to end over the wire: XLogData frames → receiver stamps
    mtypes + rolls safe segments + acks flush LSNs → stream_ingest
    (clustered zero-shuffle path) → final state ≡ the serial oracle.
    Feedback observed by the server is strictly monotone and reaches
    the last LSN."""
    frames, want_mtypes = _frames_and_meta(P_SOCK)
    frames_dir = str(tmp_path / "frames")

    srv = WalSocketServer(frames, keepalive_every=97).start()
    rx = SocketWalReceiver(srv.addr, frames_dir, segment_frames=60)
    rx.run()
    srv.join()

    # multiple segment files, each cut at a safe boundary
    files = sorted(os.listdir(frames_dir))
    assert rx.segments_landed == len(files) >= 4

    # capture-time mtype stamping reproduces the generator's stamps
    import pyarrow.parquet as pq

    got_mtypes = {}
    open_stream_per_file = []
    for name in files:
        t = pq.read_table(os.path.join(frames_dir, name))
        lsns = t.column("lsn").to_pylist()
        mts = t.column("mtype").to_pylist()
        got_mtypes.update(zip(lsns, mts))
        # whole streams per file: S-first count == c + full-A count
        opens = sum(1 for m, pl in zip(mts, t.column("payload").to_pylist())
                    if m == "S" and bytes(pl)[5] != 0)
        closes = sum(1 for m in mts if m in ("c", "A"))
        open_stream_per_file.append(opens - closes)
    assert got_mtypes == want_mtypes
    assert all(d == 0 for d in open_stream_per_file), open_stream_per_file
    assert any(m in ("i", "u", "d") for m in got_mtypes.values()), \
        "fixture must exercise in-chunk stamping"

    # flush feedback: non-decreasing (keepalive replies may repeat the
    # current flush), ends at the stream's last LSN
    h = srv.flush_history
    assert all(a <= b for a, b in zip(h, h[1:])), h
    assert h[-1] == frames[-1][0]
    assert len(srv.flush_history) >= rx.segments_landed

    # the landed files ARE a valid engine source: zero-shuffle streaming
    # ingest matches the serial DuckDB oracle
    table = LakeTable.create(
        spark, str(tmp_path / "lake"),
        schema=[(c, "string") for c in gen.ALL_COLUMNS],
        key_cols=list(gen.KEY_COLUMNS), n_buckets=8,
    )
    q = pipeline.stream_ingest(
        spark, frames_dir, table, str(tmp_path / "ckpt"),
        max_files_per_trigger=2, clustered=True,
    )
    q.awaitTermination(300)
    got = table.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    want = (
        duckdb.sql(gen.duckdb_final_state_sql(P_SOCK, with_sha=False))
        .df().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert got[want.columns.tolist()].equals(want)


def test_keepalive_reply_requested_gets_prompt_status(tmp_path):
    """A keepalive with replyRequested must be answered even mid-segment
    (a real primary uses this to time out dead standbys)."""
    p = gen.GenParams(n_txns=6, ops_per_txn=4, txns_per_segment=6)
    frames, _ = _frames_and_meta(p)
    srv = WalSocketServer(frames, keepalive_every=5).start()
    rx = SocketWalReceiver(
        srv.addr, str(tmp_path / "frames"), segment_frames=10_000
    )  # segment larger than the stream: only keepalives + final ack
    rx.run()
    srv.join()
    # replies to keepalives arrive before any segment landed → flush -1
    # (wire -1+1 = 0), then the final CopyDone ack carries the last LSN
    assert srv.flush_history[0] == -1
    assert srv.flush_history[-1] == frames[-1][0]


def test_mid_transaction_never_cut(tmp_path):
    """segment_frames=1 would cut after every frame if the safe-boundary
    guard did not hold it open through B..C and S..c spans."""
    p = gen.GenParams(n_txns=8, ops_per_txn=5, txns_per_segment=8,
                      stream_pct=50, stream_abort_pct=0)
    frames, _ = _frames_and_meta(p)
    frames_dir = str(tmp_path / "frames")
    srv = WalSocketServer(frames, keepalive_every=10_000).start()
    rx = SocketWalReceiver(srv.addr, frames_dir, segment_frames=1)
    rx.run()
    srv.join()
    import pyarrow.parquet as pq

    for name in sorted(os.listdir(frames_dir)):
        t = pq.read_table(os.path.join(frames_dir, name))
        mts = t.column("mtype").to_pylist()
        # every file closes what it opens
        assert mts.count("B") == mts.count("C")
        opens = sum(1 for m, pl in zip(mts, t.column("payload").to_pylist())
                    if m == "S" and bytes(pl)[5] != 0)
        assert opens == mts.count("c") + mts.count("A")


def test_torn_control_frame_does_not_kill_observer(tmp_path):
    """A torn frame whose first byte spells a control type ('S'/'c'/'A'
    but the body is too short to parse) must be stamped and landed, not
    raise out of the receiver: state stays at the last intact frame so
    segment cuts remain safe, and decode quarantines the torn bytes."""
    from pypgoutput_spark.sources.walsock import SocketWalReceiver

    r = SocketWalReceiver(("127.0.0.1", 0), str(tmp_path / "f"))
    assert r._observe(b"S") == "S"          # torn: no body at all
    assert r._observe(b"c\x00\x00") == "c"  # torn commit
    assert r._observe(b"A\x00\x00\x00\x01") == "A"  # torn abort
    assert r._safe_cut()                    # none of them mutated state
    # an intact stream still tracks normally afterwards
    import struct
    assert r._observe(b"S" + struct.pack(">i", 9) + b"\x01") == "S"
    assert not r._safe_cut()
    assert r._observe(b"E") == "E"
    assert r._observe(b"c" + struct.pack(">i", 9) + b"\x00" + b"\x00" * 24) == "c"
    assert r._safe_cut()


def test_handshake_negotiates_replication_session(tmp_path):
    """The FE/BE startup + START_REPLICATION phase: the server sees a
    replication=database StartupMessage and the slot/publication/
    proto_version command; the client records the server's
    ParameterStatus values."""
    frames, _ = _frames_and_meta(gen.GenParams(n_txns=4, ops_per_txn=2))
    srv = WalSocketServer(frames, keepalive_every=1000).start()
    rx = SocketWalReceiver(
        srv.addr, str(tmp_path / "frames"), segment_frames=50,
        slot="my_slot", publication="my_pub", proto_version=2,
    )
    rx.run()
    srv.join()
    assert srv.startup_params.get("replication") == "database"
    assert srv.startup_params.get("user") == "replicator"
    q = srv.start_replication_query
    assert q.startswith('START_REPLICATION SLOT "my_slot" LOGICAL 0/0')
    assert "proto_version '2'" in q and '"my_pub"' in q
    assert rx.server_params.get("server_version") == "16.0"
    assert rx.segments_landed > 0


def test_handshake_refuses_unsupported_proto_version(tmp_path):
    """proto_version '3' draws an ErrorResponse before COPY-both — the
    loud-refusal policy at the wire boundary."""
    frames, _ = _frames_and_meta(gen.GenParams(n_txns=2, ops_per_txn=2))
    srv = WalSocketServer(frames).start()
    rx = SocketWalReceiver(
        srv.addr, str(tmp_path / "frames"), proto_version=3,
    )
    with pytest.raises(ValueError, match="START_REPLICATION refused"):
        rx.run()
    with pytest.raises(ValueError, match="unsupported proto_version"):
        srv.join()


def test_handshake_refuses_non_replication_session(tmp_path):
    """A plain-session StartupMessage (no replication=database) gets a
    FATAL ErrorResponse, like a real walsender-only endpoint."""
    import socket as _socket
    import struct as _struct

    frames, _ = _frames_and_meta(gen.GenParams(n_txns=2, ops_per_txn=2))
    srv = WalSocketServer(frames).start()
    sock = _socket.create_connection(srv.addr)
    body = _struct.pack(">i", 196608) + b"user\x00alice\x00\x00"
    sock.sendall(_struct.pack(">i", 4 + len(body)) + body)
    t = sock.recv(1)
    assert t == b"E", "server must answer ErrorResponse"
    sock.close()
    with pytest.raises(ValueError, match="replication session"):
        srv.join()


def test_socket_stream_two_phase_composed_matches_oracle(spark, tmp_path):
    """The full wire path with every transaction grammar at once —
    plain B..C, streams (c/A), plain prepared (b..P), streamed prepared
    ('p') and their later K/r decisions: the receiver stamps 'p' frames
    (and 'x' for Rollback Prepared — the in-chunk-Relation stamp owns
    lowercase 'r'), closes streams on Stream Prepare for safe segment
    cuts, and batch ingest over the landed files ≡ the serial oracle."""
    p = gen.GenParams(n_txns=40, ops_per_txn=5, toast_pct=25,
                      txns_per_segment=5, stream_pct=45, stream_abort_pct=25,
                      two_phase_pct=40, two_phase_rollback_pct=30,
                      two_phase_gap=7)
    frames, want_mtypes = _frames_and_meta(p)
    frames_dir = str(tmp_path / "frames")

    srv = WalSocketServer(frames, keepalive_every=83).start()
    rx = SocketWalReceiver(srv.addr, frames_dir, segment_frames=40)
    rx.run()
    srv.join()

    import pyarrow.parquet as pq

    files = sorted(os.listdir(frames_dir))
    assert len(files) >= 3
    got_mtypes = {}
    for name in files:
        t = pq.read_table(os.path.join(frames_dir, name))
        mts = t.column("mtype").to_pylist()
        got_mtypes.update(zip(t.column("lsn").to_pylist(), mts))
        # whole streams per file: 'p' closes a stream like 'c'/'A'
        opens = sum(1 for m, pl in zip(mts, t.column("payload").to_pylist())
                    if m == "S" and bytes(pl)[5] != 0)
        closes = sum(1 for m in mts if m in ("c", "A", "p"))
        assert opens == closes, name
    assert got_mtypes == want_mtypes  # incl. 'p', 'b', 'P', 'K', 'x'
    assert "p" in got_mtypes.values() and "x" in got_mtypes.values()

    table = LakeTable.create(
        spark, str(tmp_path / "lake"),
        schema=[(c, "string") for c in gen.ALL_COLUMNS],
        key_cols=list(gen.KEY_COLUMNS), n_buckets=8,
    )
    frames_df = spark.read.schema(gen.FRAMES_SCHEMA).parquet(frames_dir)
    pipeline.run_ingest(spark, frames_df, table, n_batches=3)
    got = table.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    want = (
        duckdb.sql(gen.duckdb_final_state_sql(p, with_sha=False))
        .df().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert got[want.columns.tolist()].equals(want)
