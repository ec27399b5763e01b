"""Streamed two-phase commit (PG15 ``streaming = on, two_phase = on``):
Stream Prepare 'p' — the protocol-v2 spelling of 'P' — seals a streamed
transaction as PREPARED. The decode kernels release the buffered chunk
events stamped with (xid, first-S lsn, prepare ts) exactly like a plain
b..P span's body and emit a 'p' marker row; the pipeline stages the
events until the Commit/Rollback Prepared decision arrives (possibly
micro-batches later) through the SAME machinery as plain two-phase.

The reference decoder pins proto v1 (reference reader.py:360-361) and
predates two-phase (reference decoders.py handles B/C/O/R/Y/I/U/D/T
only) — parity-plus on both axes, like the v2 stream grammar itself.
"""

from __future__ import annotations

import os
import tempfile

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

from pypgoutput_spark.lake.table import LakeTable
from pypgoutput_spark.operators import decode as decode_op
from pypgoutput_spark.plans.registry import RelationRegistry
from pypgoutput_spark.streaming import pipeline as pipe
from pypgoutput_spark.wal import codec, generator as gen, vdecode

RID = gen.RELATION_ID


def _rel_payload():
    return codec.encode_relation(
        RID, "public", "repo_files", "d",
        [(1, "repo", 25, -1), (1, "path", 25, -1), (0, "content", 25, -1)],
    )


def _plain_registry():
    rr = RelationRegistry()
    rr.add_relation(1, codec.decode_message(_rel_payload()))
    return rr.to_plain()


def _sx(payload, xid):
    return codec.add_stream_xid(payload, xid)


def _ins(k, v):
    return codec.encode_insert(RID, [("t", k[0]), ("t", k[1]), ("t", v)])


def _decode_all_kernels(frames, plain):
    pdf = pd.DataFrame(
        {"segment": [f[0] for f in frames], "lsn": [f[1] for f in frames],
         "payload": [f[2] for f in frames]}
    )
    loop = pd.DataFrame(
        decode_op._loop_decode_pdf(pdf, {}, plain, strict=True)
    )
    rb = pa.RecordBatch.from_pandas(pdf)
    vec = pa.Table.from_batches(
        list(vdecode.process_batch(rb, {}, plain))
    ).to_pandas()
    opt_kernel = decode_op._make_optimistic_kernel(plain, forbid_loop=True)
    opt = pa.Table.from_batches(list(opt_kernel(iter([rb])))).to_pandas()
    out = []
    for df in (loop, vec, opt):
        out.append(df.sort_values(["lsn", "op"]).reset_index(drop=True))
    return out


# ---------------------------------------------------------------------------
# kernel grammar + parity
# ---------------------------------------------------------------------------


def test_stream_prepare_releases_events_all_kernels():
    """S..E p K: the prepared stream's events release stamped with
    (xid, first-S lsn, PREPARE ts); 'p' and 'K' marker rows carry the
    gid; all three kernels agree (the optimistic run pins the
    vectorized path via forbid_loop)."""
    frames = [
        (0, 100, codec.encode_stream_start(777, True)),
        (0, 101, _sx(_ins(("rA", "p1"), "v1"), 777)),
        (0, 102, _sx(codec.encode_update(
            RID, [("t", "rA"), ("t", "p1"), ("u", None)]), 777)),
        (0, 103, codec.encode_stream_stop()),
        (0, 110, codec.encode_stream_prepare(109, 110, 5_000_000, 777, "gid-777")),
        (0, 300, codec.encode_begin(300, 7_000_000, 900)),
        (0, 301, _ins(("rB", "p2"), "v2")),
        (0, 309, codec.encode_commit(309, 310, 7_000_000)),
        (0, 400, codec.encode_commit_prepared(400, 401, 9_000_000, 777, "gid-777")),
    ]
    loop, vec, opt = _decode_all_kernels(frames, _plain_registry())
    for df in (vec, opt):
        for c in ("lsn", "op", "xid", "begin_lsn", "commit_ts_us"):
            assert list(loop[c].fillna(-9)) == list(df[c].fillna(-9)), c
    ev = loop[loop["op"].isin(["I", "U"]) & (loop["xid"] == 777)]
    assert len(ev) == 2
    assert set(ev["begin_lsn"]) == {100}
    assert set(ev["commit_ts_us"]) == {5_000_000}  # PREPARE ts, not K's
    mk = {r["op"]: r for _, r in loop[loop["op"].isin(["p", "K"])].iterrows()}
    assert set(mk) == {"p", "K"}
    assert list(mk["p"]["new_vals"]) == ["gid-777"]
    assert mk["p"]["commit_ts_us"] == 5_000_000 and mk["p"]["xid"] == 777
    assert mk["K"]["commit_ts_us"] == 9_000_000


def test_stream_prepare_interleaved_with_plain_stream():
    """Chunks of a to-be-prepared stream interleave with a plain stream
    that commits — each resolves to its own fate and stamps."""
    frames = [
        (0, 100, codec.encode_stream_start(1, True)),
        (0, 101, _sx(_ins(("rP", "p1"), "prepared"), 1)),
        (0, 102, codec.encode_stream_stop()),
        (0, 103, codec.encode_stream_start(2, True)),
        (0, 104, _sx(_ins(("rC", "p1"), "committed"), 2)),
        (0, 105, codec.encode_stream_stop()),
        (0, 106, codec.encode_stream_start(1, False)),
        (0, 107, _sx(_ins(("rP", "p2"), "prepared-2"), 1)),
        (0, 108, codec.encode_stream_stop()),
        (0, 110, codec.encode_stream_commit(2, 109, 110, 6_000_000)),
        (0, 111, codec.encode_stream_prepare(110, 111, 5_000_000, 1, "g1")),
    ]
    loop, vec, opt = _decode_all_kernels(frames, _plain_registry())
    for df in (loop, vec, opt):
        by_xid = df[df["op"] == "I"].groupby("xid")
        assert set(by_xid.groups) == {1, 2}
        g1 = by_xid.get_group(1)
        assert len(g1) == 2 and set(g1["commit_ts_us"]) == {5_000_000}
        assert set(g1["begin_lsn"]) == {100}
        g2 = by_xid.get_group(2)
        assert len(g2) == 1 and set(g2["commit_ts_us"]) == {6_000_000}
        assert set(g2["begin_lsn"]) == {103}
        assert list(df[df["op"] == "p"]["xid"]) == [1]


def test_stream_prepare_grammar_edges():
    plain = _plain_registry()

    def decode_both(frames):
        pdf = pd.DataFrame(
            {"segment": [f[0] for f in frames], "lsn": [f[1] for f in frames],
             "payload": [f[2] for f in frames]}
        )
        return (
            lambda: decode_op._loop_decode_pdf(pdf, {}, plain, strict=True),
            lambda: list(vdecode.process_batch(
                pa.RecordBatch.from_pandas(pdf), {}, plain)),
        )

    # 'p' inside an open chunk
    for run in decode_both([
        (0, 100, codec.encode_stream_start(1, True)),
        (0, 101, codec.encode_stream_prepare(100, 101, 5, 1, "g")),
    ]):
        with pytest.raises(ValueError, match="inside an open chunk"):
            run()
    # 'p' then a full Stream Abort for the same xid
    for run in decode_both([
        (0, 100, codec.encode_stream_start(1, True)),
        (0, 101, codec.encode_stream_stop()),
        (0, 102, codec.encode_stream_prepare(101, 102, 5, 1, "g")),
        (0, 103, codec.encode_stream_abort(1)),
    ]):
        with pytest.raises(ValueError):
            run()
    # duplicate seal: 'c' after 'p'
    for run in decode_both([
        (0, 100, codec.encode_stream_start(1, True)),
        (0, 101, codec.encode_stream_stop()),
        (0, 102, codec.encode_stream_prepare(101, 102, 5, 1, "g")),
        (0, 103, codec.encode_stream_commit(1, 102, 103, 6)),
    ]):
        with pytest.raises(ValueError):
            run()
    # truncated 'p' frame is a typed error
    for run in decode_both([
        (0, 100, codec.encode_stream_start(1, True)),
        (0, 101, codec.encode_stream_stop()),
        (0, 102, codec.encode_stream_prepare(101, 102, 5, 1, "g")[:20]),
    ]):
        with pytest.raises(ValueError):
            run()


def test_subxid_abort_then_stream_prepare():
    """A savepoint rolled back BEFORE the prepare (Stream Abort with
    subxid != xid) discards only that subtransaction's buffered events;
    the stream then seals with 'p' and the surviving events release —
    both kernels."""
    frames = [
        (0, 100, codec.encode_stream_start(7, True)),
        (0, 101, _sx(_ins(("rKeep", "p1"), "kept"), 7)),
        # a subtransaction's change (savepoint): embedded xid 900
        (0, 102, _sx(_ins(("rSub", "p1"), "doomed"), 900)),
        (0, 103, codec.encode_stream_stop()),
        (0, 104, codec.encode_stream_abort(7, subxid=900)),
        (0, 106, codec.encode_stream_start(7, False)),
        (0, 107, _sx(_ins(("rKeep", "p2"), "kept-2"), 7)),
        (0, 108, codec.encode_stream_stop()),
        (0, 110, codec.encode_stream_prepare(109, 110, 5, 7, "g")),
        (0, 400, codec.encode_commit_prepared(400, 401, 9, 7, "g")),
    ]
    loop, vec, opt = _decode_all_kernels(frames, _plain_registry())
    for df in (loop, vec, opt):
        ev = df[df["op"] == "I"]
        assert sorted(ev["lsn"]) == [101, 107], list(ev["lsn"])
        assert set(ev["xid"]) == {7} and set(ev["commit_ts_us"]) == {5}


def test_in_chunk_dead_letter_surfaces_on_stream_prepare():
    """strict=False: a corrupt frame inside a to-be-prepared chunk is
    BUFFERED with the stream and its op='E' quarantine row surfaces when
    'p' seals the stream (plain b..P parity — the corrupt frame
    physically existed regardless of the transaction's later fate); the
    good events release stamped, stream state drains."""
    import struct

    plain = _plain_registry()
    corrupt = (b"I" + struct.pack(">i", RID)
               + b"N\x00\x05t\x00\x00\x00\x63zz")  # cell overruns frame
    bad = [
        (0, 100, codec.encode_stream_start(7, True)),
        (0, 101, _sx(_ins(("rA", "p1"), "v1"), 7)),
        (0, 102, _sx(corrupt, 7)),
        (0, 103, codec.encode_stream_stop()),
        (0, 110, codec.encode_stream_prepare(109, 110, 5, 7, "g")),
    ]
    pdf = pd.DataFrame(
        {"segment": [r[0] for r in bad], "lsn": [r[1] for r in bad],
         "payload": [r[2] for r in bad]}
    )
    streams = decode_op.StreamState()
    out = pd.DataFrame(decode_op._loop_decode_pdf(
        pdf, {}, plain, strict=False, streams=streams))
    assert not streams
    assert list(out[out["op"] == "E"]["lsn"]) == [102]
    good = out[out["op"] == "I"]
    assert len(good) == 1 and int(good.iloc[0]["commit_ts_us"]) == 5


# ---------------------------------------------------------------------------
# pipeline: staging, cross-batch resolution, rollback, messages
# ---------------------------------------------------------------------------


def _mk_table(spark, tmp, name="lake"):
    return LakeTable.create(
        spark, os.path.join(tmp, name),
        schema=[("repo", "string"), ("path", "string"), ("content", "string")],
        key_cols=["repo", "path"], n_buckets=4,
    )


def _frames_df(spark, rows):
    return spark.createDataFrame(
        [(seg, lsn, mt, bytearray(payload)) for seg, lsn, mt, payload in rows],
        schema=gen.FRAMES_SCHEMA,
    )


def _stream_2pc_batch1(msg: bool = False):
    rows = [
        (0, 1, "R", _rel_payload()),
        (0, 100, "S", codec.encode_stream_start(777, True)),
        (0, 101, "i", _sx(_ins(("rA", "p1"), "prepared-value"), 777)),
    ]
    if msg:
        rows.append((0, 102, "m", _sx(codec.encode_logical_message(
            True, 102, "outbox", b'{"k":1}'), 777)))
    rows += [
        (0, 105, "E", codec.encode_stream_stop()),
        (0, 110, "p", codec.encode_stream_prepare(109, 110, 5, 777, "gid-777")),
        (0, 120, "B", codec.encode_begin(120, 6, 800)),
        (0, 121, "I", _ins(("rB", "p1"), "plain-value")),
        (0, 129, "C", codec.encode_commit(129, 130, 6)),
    ]
    return rows


def test_streamed_prepare_cross_batch_commit(spark):
    tmp = tempfile.mkdtemp(prefix="s2pc_")
    table = _mk_table(spark, tmp)
    b1 = _frames_df(spark, _stream_2pc_batch1())
    b2 = _frames_df(spark, [
        (1, 400, "K", codec.encode_commit_prepared(400, 401, 9, 777, "gid-777")),
    ])
    registry = RelationRegistry.from_frames(b1)
    pending_dir = os.path.join(tmp, "pending")
    m1 = pipe.apply_frames_batch(table, b1, registry, pending_2pc=None,
                                 pending_dir=pending_dir)
    assert m1["two_phase"]["pending"] == [777]
    assert m1["two_phase"]["staged_rows"] == 1
    assert {r["repo"] for r in table.read().collect()} == {"rB"}
    # the 'p' marker opened AND sealed the span in one frame
    assert pipe.stored_pending_2pc(table)["xids"] == {
        "777": {"gid": "gid-777", "b_lsn": 110, "segment": 0, "sealed": True}
    }
    m2 = pipe.apply_frames_batch(table, b2, registry,
                                 pending_2pc=m1["pending_2pc"],
                                 pending_dir=pending_dir)
    assert m2["two_phase"]["committed"] == [777]
    rows = {r["repo"]: r["content"] for r in table.read().collect()}
    assert rows == {"rA": "prepared-value", "rB": "plain-value"}
    assert not os.path.isdir(pending_dir)


def test_streamed_prepare_rollback_discards(spark):
    tmp = tempfile.mkdtemp(prefix="s2pc_")
    table = _mk_table(spark, tmp)
    b1 = _frames_df(spark, _stream_2pc_batch1())
    b2 = _frames_df(spark, [
        (1, 400, "x", codec.encode_rollback_prepared(110, 401, 5, 9, 777, "gid-777")),
    ])
    registry = RelationRegistry.from_frames(b1)
    pending_dir = os.path.join(tmp, "pending")
    m1 = pipe.apply_frames_batch(table, b1, registry, pending_2pc=None,
                                 pending_dir=pending_dir)
    m2 = pipe.apply_frames_batch(table, b2, registry,
                                 pending_2pc=m1["pending_2pc"],
                                 pending_dir=pending_dir)
    assert m2["two_phase"]["rolled_back"] == [777]
    assert {r["repo"] for r in table.read().collect()} == {"rB"}


def test_streamed_prepare_same_batch_decision(spark):
    tmp = tempfile.mkdtemp(prefix="s2pc_")
    table = _mk_table(spark, tmp)
    rows = _stream_2pc_batch1() + [
        (0, 400, "K", codec.encode_commit_prepared(400, 401, 9, 777, "gid-777")),
    ]
    b1 = _frames_df(spark, rows)
    m1 = pipe.apply_frames_batch(
        table, b1, RelationRegistry.from_frames(b1), pending_2pc=None,
        pending_dir=os.path.join(tmp, "pending"))
    assert m1["two_phase"]["committed"] == [777]
    assert m1["two_phase"]["pending"] == []
    rows_ = {r["repo"]: r["content"] for r in table.read().collect()}
    assert rows_ == {"rA": "prepared-value", "rB": "plain-value"}


def test_in_chunk_message_follows_streamed_prepared_fate(spark):
    """A transactional pg_logical_emit_message INSIDE a streamed
    prepared transaction's chunk is held back with its events and
    delivered with the 'K' commit timestamp re-stamped."""
    tmp = tempfile.mkdtemp(prefix="s2pc_")
    table = _mk_table(spark, tmp)
    msgs_dir = os.path.join(tmp, "msgs")
    b1 = _frames_df(spark, _stream_2pc_batch1(msg=True))
    b2 = _frames_df(spark, [
        (1, 400, "K", codec.encode_commit_prepared(400, 401, 9_000_000, 777,
                                                   "gid-777")),
    ])
    registry = RelationRegistry.from_frames(b1)
    pending_dir = os.path.join(tmp, "pending")
    m1 = pipe.apply_frames_batch(table, b1, registry, pending_2pc=None,
                                 pending_dir=pending_dir, messages_dir=msgs_dir)
    assert m1.get("messages", 0) == 0
    m2 = pipe.apply_frames_batch(table, b2, registry,
                                 pending_2pc=m1["pending_2pc"],
                                 pending_dir=pending_dir, messages_dir=msgs_dir)
    assert m2["messages"] == 1
    row = pipe.read_messages(spark, msgs_dir).collect()[0]
    assert row["lsn"] == 102 and row["xid"] == 777
    assert row["commit_ts_us"] == 9_000_000


# ---------------------------------------------------------------------------
# generated composed stream end-to-end vs the serial DuckDB oracle
# ---------------------------------------------------------------------------


def test_generated_streamed_two_phase_matches_oracle(spark):
    p = gen.GenParams(
        n_txns=60, ops_per_txn=6, n_repos=20, n_paths=12,
        txns_per_segment=10, toast_pct=25,
        stream_pct=45, stream_abort_pct=25,
        two_phase_pct=40, two_phase_rollback_pct=30, two_phase_gap=13,
    )
    frames = gen.spark_frames_df(spark, p)
    # the composed layout emits every grammar: v1, streams (c and A),
    # plain prepared (b..P) and streamed prepared ('p')
    mtypes = {r["mtype"] for r in frames.select("mtype").distinct().collect()}
    assert {"B", "C", "S", "E", "c", "A", "b", "P", "p", "K", "x"} <= mtypes
    tmp = tempfile.mkdtemp(prefix="s2pc_")
    table = LakeTable.create(
        spark, f"{tmp}/lake",
        schema=[(c, "string") for c in gen.ALL_COLUMNS],
        key_cols=list(gen.KEY_COLUMNS), n_buckets=8,
    )
    ms = pipe.run_ingest(spark, frames, table, n_batches=4)
    # decisions crossed micro-batches for some prepared txns
    resolved_late = set()
    seen_pending: set = set()
    for m in ms:
        decided = set(m["two_phase"]["committed"]) | set(
            m["two_phase"]["rolled_back"])
        resolved_late |= decided & seen_pending
        seen_pending |= set(m["two_phase"]["pending"])
    assert resolved_late
    got = (
        table.read().toPandas()
        .sort_values(["repo", "path"]).reset_index(drop=True)
    )
    exp = (
        duckdb.sql(gen.duckdb_final_state_sql(p, with_sha=False)).df()
        .sort_values(["repo", "path"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["repo", "path", "commit", "lang", "content"]],
        exp[["repo", "path", "commit", "lang", "content"]],
        check_dtype=False,
    )
    # idempotent full replay
    pipe.run_ingest(spark, frames, table, n_batches=4)
    got2 = (
        table.read().toPandas()
        .sort_values(["repo", "path"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, got2, check_dtype=False)


def test_composed_stream_decodes_wholly_vectorized(spark):
    """The vectorized-path pin: a composed streamed-two-phase WAL decodes
    end to end with the loop kernel FORBIDDEN — Stream Prepare rides the
    offset-math stream resolver, not a per-message Python fallback."""
    p = gen.GenParams(
        n_txns=30, ops_per_txn=6, n_repos=15, n_paths=10,
        txns_per_segment=10, stream_pct=50, stream_abort_pct=20,
        two_phase_pct=40, two_phase_rollback_pct=25, two_phase_gap=7,
    )
    frames = gen.spark_frames_df(spark, p)
    raw = decode_op.decode_frames_raw(
        frames, strict=False, forbid_loop=True
    )
    ops = {r["op"]: r["n"] for r in
           raw.groupBy("op").agg({"*": "count"})
           .withColumnRenamed("count(1)", "n").collect()}
    assert "p" in ops and "K" in ops and ops.get("I", 0) > 0


def test_streamed_two_phase_crash_soak(spark, tmp_path):
    """Hard-kill the streaming child at the three commit points while a
    COMPOSED stream (v2 chunks, 'p'-sealed prepared streams, plain
    streams, plain prepared, decisions micro-batches later) is mid-
    flight, then relaunch to completion: staged prepared events, the
    pending map restored from the snapshot, and append-dedup at
    resolution together still produce exactly the serial oracle."""
    import subprocess
    import sys as _sys

    p = gen.GenParams(
        n_txns=40, ops_per_txn=5, toast_pct=30, txns_per_segment=5,
        stream_pct=45, stream_abort_pct=25,
        two_phase_pct=40, two_phase_rollback_pct=25, two_phase_gap=7,
    )
    frames = gen.spark_frames_df(spark, p)
    frames_dir = str(tmp_path / "frames")
    n_segments = (p.n_txns + p.two_phase_gap) // p.txns_per_segment + 1
    for seg in range(n_segments):
        part = frames.filter(f"segment = {seg}")
        if part.limit(1).count():
            part.coalesce(1).write.mode("append").parquet(frames_dir)
    lake_dir = str(tmp_path / "lake")
    ckpt_dir = str(tmp_path / "ckpt")
    repo = os.path.join(os.path.dirname(__file__), "..")

    def run_child(crash_point=None):
        env = dict(os.environ)
        env.pop("PYPGOUT_CRASH_POINT", None)
        if crash_point:
            env["PYPGOUT_CRASH_POINT"] = crash_point
        return subprocess.run(
            [_sys.executable, os.path.join(repo, "tools", "crash_child.py"),
             frames_dir, lake_dir, ckpt_dir],
            cwd=repo, env=env, timeout=420,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        ).returncode

    assert run_child("pre_snapshot:2") == 137
    assert run_child("pre_publish:1") == 137
    assert run_child("post_publish:1") == 137
    assert run_child() == 0

    table = LakeTable(spark, lake_dir)
    assert pipe.stored_pending_2pc(table)["xids"] == {}
    got = (
        table.read().toPandas()
        .sort_values(["repo", "path"]).reset_index(drop=True)
    )
    want = (
        duckdb.sql(gen.duckdb_final_state_sql(p, with_sha=False)).df()
        .sort_values(["repo", "path"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["repo", "path", "commit", "lang", "content"]],
        want[["repo", "path", "commit", "lang", "content"]],
        check_dtype=False,
    )
    wms = [s["watermark_lsn"] for s in table.history()
           if s.get("metrics", {}).get("lineage")]
    assert wms == sorted(set(wms)), f"non-monotone watermarks: {wms}"
