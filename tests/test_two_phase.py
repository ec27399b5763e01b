"""Two-phase commit (PG15+ ``two_phase``): codec grammar, kernel parity,
pipeline staging/resolution across micro-batches, rollback discard,
truncate voiding, and the loud-refusal edges.

A prepared transaction's body (Begin Prepare 'b' .. Prepare 'P') decodes
like any B..C span; its DECISION (Commit Prepared 'K' / Rollback
Prepared 'r') may arrive micro-batches later. The engine stages the
prepared events and resolves them when the decision lands, relying on
PostgreSQL's own lock semantics: a prepared transaction holds its row
locks until the decision, so no conflicting write to its keys can exist
while it is pending. The reference decoder predates two-phase support
(reference decoders.py handles B/C/O/R/Y/I/U/D/T only) — parity-plus.
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


# ---------------------------------------------------------------------------
# codec grammar
# ---------------------------------------------------------------------------


def test_codec_two_phase_round_trips():
    m = codec.decode_message(
        codec.encode_begin_prepare(100, 110, 5_000_000, 777, "gid-777")
    )
    assert m == {
        "msg_type": "b", "prepare_lsn": 100, "end_lsn": 110,
        "prepare_ts_us": 5_000_000, "xid": 777, "gid": "gid-777",
    }
    m = codec.decode_message(codec.encode_prepare(109, 110, 5_000_000, 777, "g"))
    assert (m["msg_type"], m["xid"], m["prepare_lsn"], m["gid"]) == ("P", 777, 109, "g")
    m = codec.decode_message(
        codec.encode_commit_prepared(200, 201, 9_000_000, 777, "gid-777")
    )
    assert (m["msg_type"], m["commit_lsn"], m["commit_ts_us"]) == ("K", 200, 9_000_000)
    m = codec.decode_message(
        codec.encode_rollback_prepared(110, 210, 5_000_000, 9_500_000, 778, "x")
    )
    assert (m["msg_type"], m["xid"], m["rollback_ts_us"]) == ("r", 778, 9_500_000)
    m = codec.decode_message(codec.encode_stream_prepare(109, 110, 5, 777, "g"))
    assert m["msg_type"] == "p"


def test_codec_two_phase_truncated_frames_raise_typed():
    for payload in (
        codec.encode_begin_prepare(1, 2, 3, 4, "g")[:20],
        codec.encode_prepare(1, 2, 3, 4, "g")[:25],
        codec.encode_commit_prepared(1, 2, 3, 4, "g")[:30],
        codec.encode_rollback_prepared(1, 2, 3, 4, 5, "g")[:38],
        # gid missing its NUL terminator
        codec.encode_commit_prepared(1, 2, 3, 4, "gid")[:-1],
    ):
        with pytest.raises(ValueError):
            codec.decode_message(payload)


# ---------------------------------------------------------------------------
# kernel parity (loop / vectorized strict / optimistic)
# ---------------------------------------------------------------------------


def _rel_payload():
    return codec.encode_relation(
        RID, "public", "repo_files", "d",
        [(1, "repo", 25, -1), (1, "path", 25, -1), (0, "content", 25, -1)],
    )


def _plain_registry():
    rr = RelationRegistry()
    rr.add_relation(1, codec.decode_message(_rel_payload()))
    return rr.to_plain()


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
    opt_kernel = decode_op._make_optimistic_kernel(plain)
    opt = pa.Table.from_batches(list(opt_kernel(iter([rb])))).to_pandas()
    out = []
    for df in (loop, vec, opt):
        out.append(df.sort_values(["lsn", "op"]).reset_index(drop=True))
    return out


def test_kernel_parity_prepared_span_and_markers():
    frames = [
        (0, 100, codec.encode_begin_prepare(100, 110, 5_000_000, 777, "gid-777")),
        (0, 101, codec.encode_insert(RID, [("t", "r1"), ("t", "p1"), ("t", "c1")])),
        (0, 102, codec.encode_update(RID, [("t", "r1"), ("t", "p1"), ("u", None)])),
        (0, 109, codec.encode_prepare(109, 110, 5_000_000, 777, "gid-777")),
        (0, 300, codec.encode_begin(300, 7_000_000, 900)),
        (0, 301, codec.encode_insert(RID, [("t", "r2"), ("t", "p2"), ("t", "c2")])),
        (0, 309, codec.encode_commit(309, 310, 7_000_000)),
        (0, 400, codec.encode_commit_prepared(400, 401, 9_000_000, 777, "gid-777")),
    ]
    loop, vec, opt = _decode_all_kernels(frames, _plain_registry())
    for df in (vec, opt):
        for c in ("lsn", "op", "xid", "begin_lsn", "commit_ts_us"):
            assert list(loop[c].fillna(-9)) == list(df[c].fillna(-9)), c
    # prepared events stamped with the span's (xid, b-lsn, prepare-ts)
    ev = loop[loop["op"].isin(["I", "U"]) & (loop["xid"] == 777)]
    assert len(ev) == 2
    assert set(ev["begin_lsn"]) == {100} and set(ev["commit_ts_us"]) == {5_000_000}
    # marker rows carry the gid and their own stamps
    mk = {r["op"]: r for _, r in loop[loop["op"].isin(list("bPKr"))].iterrows()}
    assert set(mk) == {"b", "P", "K"}
    assert list(mk["b"]["new_vals"]) == ["gid-777"]
    assert mk["K"]["commit_ts_us"] == 9_000_000 and mk["K"]["xid"] == 777
    assert mk["P"]["commit_ts_us"] == 5_000_000


def test_kernel_parity_rollback_marker():
    frames = [
        (0, 100, codec.encode_begin_prepare(100, 110, 5, 777, "g")),
        (0, 101, codec.encode_insert(RID, [("t", "r1"), ("t", "p1"), ("t", "c1")])),
        (0, 109, codec.encode_prepare(109, 110, 5, 777, "g")),
        (0, 200, codec.encode_rollback_prepared(110, 201, 5, 9, 777, "g")),
    ]
    loop, vec, opt = _decode_all_kernels(frames, _plain_registry())
    for df in (loop, vec, opt):
        r = df[df["op"] == "r"]
        assert len(r) == 1 and int(r.iloc[0]["xid"]) == 777
        assert int(r.iloc[0]["commit_ts_us"]) == 9


def test_stream_prepare_for_unknown_stream_raises_all_kernels():
    """A Stream Prepare with no open stream for its xid is a
    mis-sequenced frame — loud on every kernel (it seals a stream the
    decoder never buffered; see tests/test_streamed_2pc.py for the
    supported streamed-two-phase grammar)."""
    frames = [(0, 100, codec.encode_stream_prepare(100, 110, 5, 777, "g"))]
    pdf = pd.DataFrame(
        {"segment": [0], "lsn": [100], "payload": [frames[0][2]]}
    )
    plain = _plain_registry()
    with pytest.raises(ValueError, match="unknown xid=777"):
        decode_op._loop_decode_pdf(pdf, {}, plain, strict=True)
    rb = pa.RecordBatch.from_pandas(pdf)
    with pytest.raises(ValueError, match="unknown xid=777"):
        list(vdecode.process_batch(rb, {}, plain))


def test_prepare_xid_mismatch_raises_both_kernels():
    frames = [
        (0, 100, codec.encode_begin_prepare(100, 110, 5, 777, "g")),
        (0, 109, codec.encode_prepare(109, 110, 5, 778, "g")),
    ]
    pdf = pd.DataFrame(
        {"segment": [0, 0], "lsn": [100, 109],
         "payload": [f[2] for f in frames]}
    )
    plain = _plain_registry()
    with pytest.raises(ValueError, match="mis-sequenced"):
        decode_op._loop_decode_pdf(pdf, {}, plain, strict=True)
    with pytest.raises(ValueError, match="mis-sequenced"):
        list(vdecode.process_batch(pa.RecordBatch.from_pandas(pdf), {}, plain))


# ---------------------------------------------------------------------------
# pipeline: staging, cross-batch resolution, rollback, voiding
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


def _ins(k, v):
    return codec.encode_insert(RID, [("t", k[0]), ("t", k[1]), ("t", v)])


def test_cross_batch_resolution_staging_and_gc(spark):
    tmp = tempfile.mkdtemp(prefix="p2pc_")
    table = _mk_table(spark, tmp)
    rel = (0, 1, "R", _rel_payload())
    b1 = _frames_df(spark, [
        rel,
        (0, 100, "b", codec.encode_begin_prepare(100, 110, 5, 777, "gid-777")),
        (0, 101, "I", _ins(("rA", "p1"), "prepared-value")),
        (0, 109, "P", codec.encode_prepare(109, 110, 5, 777, "gid-777")),
        (0, 120, "B", codec.encode_begin(120, 6, 800)),
        (0, 121, "I", _ins(("rB", "p1"), "plain-value")),
        (0, 129, "C", codec.encode_commit(129, 130, 6)),
    ])
    b2 = _frames_df(spark, [
        (1, 200, "B", codec.encode_begin(200, 7, 801)),
        (1, 201, "I", _ins(("rC", "p1"), "later-value")),
        (1, 209, "C", codec.encode_commit(209, 210, 7)),
    ])
    b3 = _frames_df(spark, [
        (2, 400, "K", codec.encode_commit_prepared(400, 401, 9, 777, "gid-777")),
    ])
    registry = RelationRegistry.from_frames(b1)
    pending_dir = os.path.join(tmp, "pending")
    state = pipe.stored_pending_2pc(table)
    m1 = pipe.apply_frames_batch(table, b1, registry, pending_2pc=state,
                                 pending_dir=pending_dir)
    # prepared events staged, not merged
    assert m1["two_phase"]["pending"] == [777]
    assert m1["two_phase"]["staged_rows"] == 1
    assert os.path.isdir(pending_dir)
    got = {r["repo"] for r in table.read().collect()}
    assert got == {"rB"}
    # state persisted in the snapshot (resume-safe)
    assert pipe.stored_pending_2pc(table)["xids"] == {
        "777": {"gid": "gid-777", "b_lsn": 100, "segment": 0, "sealed": True}
    }
    m2 = pipe.apply_frames_batch(table, b2, registry,
                                 pending_2pc=m1["pending_2pc"],
                                 pending_dir=pending_dir)
    assert m2["two_phase"]["pending"] == [777]
    assert {r["repo"] for r in table.read().collect()} == {"rB", "rC"}
    m3 = pipe.apply_frames_batch(table, b3, registry,
                                 pending_2pc=m2["pending_2pc"],
                                 pending_dir=pending_dir)
    assert m3["two_phase"]["committed"] == [777]
    assert m3["two_phase"]["pending"] == []
    rows = {r["repo"]: r["content"] for r in table.read().collect()}
    assert rows == {"rA": "prepared-value", "rB": "plain-value",
                    "rC": "later-value"}
    # staging GC'd once nothing is pending; state cleared
    assert not os.path.isdir(pending_dir)
    assert pipe.stored_pending_2pc(table)["xids"] == {}


def test_rollback_discards_staged_events(spark):
    tmp = tempfile.mkdtemp(prefix="p2pc_")
    table = _mk_table(spark, tmp)
    b1 = _frames_df(spark, [
        (0, 1, "R", _rel_payload()),
        (0, 100, "b", codec.encode_begin_prepare(100, 110, 5, 777, "g")),
        (0, 101, "I", _ins(("rA", "p1"), "doomed")),
        (0, 109, "P", codec.encode_prepare(109, 110, 5, 777, "g")),
        (0, 120, "B", codec.encode_begin(120, 6, 800)),
        (0, 121, "I", _ins(("rB", "p1"), "kept")),
        (0, 129, "C", codec.encode_commit(129, 130, 6)),
    ])
    b2 = _frames_df(spark, [
        (1, 200, "x", codec.encode_rollback_prepared(110, 201, 5, 9, 777, "g")),
    ])
    registry = RelationRegistry.from_frames(b1)
    pending_dir = os.path.join(tmp, "pending")
    m1 = pipe.apply_frames_batch(table, b1, registry,
                                 pending_2pc=None, pending_dir=pending_dir)
    assert m1["two_phase"]["pending"] == [777]
    m2 = pipe.apply_frames_batch(table, b2, registry,
                                 pending_2pc=m1["pending_2pc"],
                                 pending_dir=pending_dir)
    assert m2["two_phase"]["rolled_back"] == [777]
    assert {r["repo"] for r in table.read().collect()} == {"rB"}
    assert not os.path.isdir(pending_dir)


def test_truncate_while_pending_voids_staged_events(spark):
    """Serial replay-by-LSN: a truncate committed while a transaction was
    pending kills its staged (lower-LSN) events at resolution. (Real PG
    cannot produce this on the SAME table — the prepared transaction's
    locks block TRUNCATE — so this pins the engine's defensive serial
    semantics, not a reachable PG shape.)"""
    tmp = tempfile.mkdtemp(prefix="p2pc_")
    table = _mk_table(spark, tmp)
    b1 = _frames_df(spark, [
        (0, 1, "R", _rel_payload()),
        (0, 50, "B", codec.encode_begin(50, 4, 700)),
        (0, 51, "I", _ins(("rSeed", "p1"), "seed")),
        (0, 59, "C", codec.encode_commit(59, 60, 4)),
        (0, 100, "b", codec.encode_begin_prepare(100, 110, 5, 777, "g")),
        (0, 101, "I", _ins(("rA", "p1"), "voided-by-truncate")),
        (0, 109, "P", codec.encode_prepare(109, 110, 5, 777, "g")),
    ])
    b2 = _frames_df(spark, [
        (1, 200, "B", codec.encode_begin(200, 6, 800)),
        (1, 201, "T", codec.encode_truncate([RID])),
        (1, 202, "I", _ins(("rB", "p1"), "post-truncate")),
        (1, 209, "C", codec.encode_commit(209, 210, 6)),
    ])
    b3 = _frames_df(spark, [
        (2, 400, "K", codec.encode_commit_prepared(400, 401, 9, 777, "g")),
    ])
    registry = RelationRegistry.from_frames(b1)
    pending_dir = os.path.join(tmp, "pending")
    m1 = pipe.apply_frames_batch(table, b1, registry,
                                 pending_2pc=None, pending_dir=pending_dir)
    m2 = pipe.apply_frames_batch(table, b2, registry,
                                 pending_2pc=m1["pending_2pc"],
                                 pending_dir=pending_dir)
    assert m2["pending_2pc"]["t_void"] == {str(RID): 201}
    m3 = pipe.apply_frames_batch(table, b3, registry,
                                 pending_2pc=m2["pending_2pc"],
                                 pending_dir=pending_dir)
    assert m3["two_phase"]["committed"] == [777]
    # the staged lsn-101 insert died at the lsn-201 truncate
    assert {r["repo"] for r in table.read().collect()} == {"rB"}


def test_truncate_inside_open_prepared_span_refused(spark):
    tmp = tempfile.mkdtemp(prefix="p2pc_")
    table = _mk_table(spark, tmp)
    b1 = _frames_df(spark, [
        (0, 1, "R", _rel_payload()),
        (0, 100, "b", codec.encode_begin_prepare(100, 110, 5, 777, "g")),
        (0, 101, "T", codec.encode_truncate([RID])),
        (0, 109, "P", codec.encode_prepare(109, 110, 5, 777, "g")),
    ])
    registry = RelationRegistry.from_frames(b1)
    with pytest.raises(decode_op.UnsupportedStreamOp, match="prepared"):
        pipe.apply_frames_batch(table, b1, registry, pending_2pc=None,
                                pending_dir=os.path.join(tmp, "pending"))
    # span cut across batches: 'b' landed last batch, T arrives before 'P'
    b_open = _frames_df(spark, [
        (0, 1, "R", _rel_payload()),
        (0, 100, "b", codec.encode_begin_prepare(100, 110, 5, 778, "g")),
        (0, 101, "I", _ins(("rA", "p1"), "v")),
    ])
    m1 = pipe.apply_frames_batch(table, b_open, RelationRegistry.from_frames(b_open),
                                 pending_2pc=None,
                                 pending_dir=os.path.join(tmp, "pending"))
    assert m1["pending_2pc"]["xids"]["778"]["sealed"] is False
    b_t = _frames_df(spark, [
        (0, 150, "T", codec.encode_truncate([RID])),
    ])
    with pytest.raises(decode_op.UnsupportedStreamOp, match="prepared"):
        pipe.apply_frames_batch(table, b_t, RelationRegistry.from_frames(b_open),
                                pending_2pc=m1["pending_2pc"],
                                pending_dir=os.path.join(tmp, "pending"))


def test_decision_for_unknown_xid_raises(spark):
    tmp = tempfile.mkdtemp(prefix="p2pc_")
    table = _mk_table(spark, tmp)
    frames = _frames_df(spark, [
        (0, 1, "R", _rel_payload()),
        (0, 400, "K", codec.encode_commit_prepared(400, 401, 9, 999, "g")),
    ])
    with pytest.raises(ValueError, match="unknown xid=999"):
        pipe.apply_frames_batch(table, frames, RelationRegistry.from_frames(frames),
                                pending_2pc=None,
                                pending_dir=os.path.join(tmp, "nonexistent"))


def test_transactional_message_follows_prepared_fate(spark):
    """A pg_logical_emit_message inside a prepared transaction is held
    back with its events: delivered (with the 'K' commit timestamp
    re-stamped) only on Commit Prepared, never for a rollback."""
    tmp = tempfile.mkdtemp(prefix="p2pc_")
    table = _mk_table(spark, tmp)
    msgs_dir = os.path.join(tmp, "msgs")
    mk_msg = lambda lsn: codec.encode_logical_message(  # noqa: E731
        True, lsn, "outbox", b'{"k":1}')
    b1 = _frames_df(spark, [
        (0, 1, "R", _rel_payload()),
        (0, 100, "b", codec.encode_begin_prepare(100, 110, 5, 777, "g")),
        (0, 101, "I", _ins(("rA", "p1"), "v")),
        (0, 102, "M", mk_msg(102)),
        (0, 109, "P", codec.encode_prepare(109, 110, 5, 777, "g")),
        (0, 120, "b", codec.encode_begin_prepare(120, 130, 5, 778, "g")),
        (0, 122, "M", mk_msg(122)),
        (0, 129, "P", codec.encode_prepare(129, 130, 5, 778, "g")),
    ])
    b2 = _frames_df(spark, [
        (1, 400, "K", codec.encode_commit_prepared(400, 401, 9_000_000, 777, "g")),
        (1, 410, "x", codec.encode_rollback_prepared(130, 411, 5, 9, 778, "g")),
    ])
    registry = RelationRegistry.from_frames(b1)
    pending_dir = os.path.join(tmp, "pending")
    m1 = pipe.apply_frames_batch(table, b1, registry, pending_2pc=None,
                                 pending_dir=pending_dir, messages_dir=msgs_dir)
    assert m1.get("messages", 0) == 0  # held back with the pending events
    m2 = pipe.apply_frames_batch(table, b2, registry,
                                 pending_2pc=m1["pending_2pc"],
                                 pending_dir=pending_dir, messages_dir=msgs_dir)
    assert m2["messages"] == 1
    delivered = pipe.read_messages(spark, msgs_dir).collect()
    assert len(delivered) == 1
    row = delivered[0]
    assert row["lsn"] == 102 and row["xid"] == 777
    # commit timestamp re-stamped from 'K' (decode could only know the
    # prepare timestamp)
    assert row["commit_ts_us"] == 9_000_000


# ---------------------------------------------------------------------------
# generated stream end-to-end vs the serial DuckDB oracle
# ---------------------------------------------------------------------------


def test_generated_two_phase_stream_matches_oracle(spark):
    p = gen.GenParams(
        n_txns=60, ops_per_txn=6, n_repos=20, n_paths=12,
        txns_per_segment=10, toast_pct=25,
        two_phase_pct=40, two_phase_rollback_pct=30, two_phase_gap=13,
    )
    frames = gen.spark_frames_df(spark, p)
    tmp = tempfile.mkdtemp(prefix="p2pc_")
    table = LakeTable.create(
        spark, f"{tmp}/lake",
        schema=[(c, "string") for c in gen.ALL_COLUMNS],
        key_cols=list(gen.KEY_COLUMNS), n_buckets=8,
    )
    ms = pipe.run_ingest(spark, frames, table, n_batches=4)
    # the gap actually crossed micro-batches: some batch carried pendings
    assert any(m["two_phase"]["pending"] for m in ms)
    # and resolved some transactions prepared in an EARLIER batch
    resolved_late = set()
    seen_pending: set = set()
    for m in ms:
        resolved_late |= set(m["two_phase"]["committed"]) & seen_pending
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


def test_mid_span_lsn_cut_carries_prepared_span(spark):
    """A micro-batch cut INSIDE a b..P span (split='lsn'): the
    open-transaction carry stamps the straddled events and the pipeline
    state carries the unsealed span — final state still matches."""
    p = gen.GenParams(
        n_txns=24, ops_per_txn=6, n_repos=12, n_paths=8,
        txns_per_segment=8, two_phase_pct=50, two_phase_rollback_pct=25,
        two_phase_gap=5,
    )
    frames = gen.spark_frames_df(spark, p)
    tmp = tempfile.mkdtemp(prefix="p2pc_")
    table = LakeTable.create(
        spark, f"{tmp}/lake",
        schema=[(c, "string") for c in gen.ALL_COLUMNS],
        key_cols=list(gen.KEY_COLUMNS), n_buckets=8,
    )
    pipe.run_ingest(spark, frames, table, n_batches=7, split="lsn")
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


def test_two_phase_crash_soak(spark, tmp_path):
    """Hard-kill the streaming child at the three commit points while a
    two-phase stream (decisions landing micro-batches later) is mid-
    flight, then relaunch to completion: the staged prepared events, the
    pending map restored from the snapshot (stored_pending_2pc), and the
    append-dedup at resolution must together still produce exactly the
    serial oracle — the crash-consistency proof for the staging path."""
    import subprocess
    import sys as _sys

    p = gen.GenParams(
        n_txns=40, ops_per_txn=5, toast_pct=30, txns_per_segment=5,
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


def test_generator_guards():
    with pytest.raises(ValueError, match="two_phase_pct composes only"):
        gen.GenParams(two_phase_pct=10, key_change_pct=10)
    with pytest.raises(ValueError, match="interleave_streams"):
        gen.GenParams(two_phase_pct=10, stream_pct=10,
                      interleave_streams=True, txns_per_segment=4)
    with pytest.raises(ValueError, match="two_phase_gap"):
        gen.GenParams(two_phase_pct=10, two_phase_gap=0)


def test_receiver_producer_two_phase_byte_parity(spark):
    """The Spark-free pandas producer emits byte-identical frames to
    ``spark_frames_df`` for two-phase layouts — plain AND composed with
    streams (Stream Prepare 'p'). Incremental txn ranges are refused
    (decision frames land gap windows later, out of the range's own
    LSN order)."""
    from pypgoutput_spark.sources import receiver

    for p in (
        gen.GenParams(n_txns=20, ops_per_txn=5, txns_per_segment=5,
                      two_phase_pct=40, two_phase_rollback_pct=30,
                      two_phase_gap=4),
        gen.GenParams(n_txns=20, ops_per_txn=5, txns_per_segment=5,
                      stream_pct=50, stream_abort_pct=25,
                      two_phase_pct=40, two_phase_rollback_pct=30,
                      two_phase_gap=4),
    ):
        got = (
            receiver.encode_frames_pdf(p, include_relation=True)
            .sort_values("lsn").reset_index(drop=True)
        )
        want = (
            gen.spark_frames_df(spark, p).toPandas()
            .sort_values("lsn").reset_index(drop=True)
        )
        assert list(got["lsn"]) == list(want["lsn"])
        assert list(got["mtype"]) == list(want["mtype"])
        assert [bytes(b) for b in got["payload"]] == [
            bytes(b) for b in want["payload"]
        ]
    with pytest.raises(ValueError, match="full txn range"):
        receiver.encode_frames_pdf(
            gen.GenParams(n_txns=20, two_phase_pct=10), txn_hi=10
        )


def test_replayed_decision_resolves_from_default_staging_dir(spark):
    """Crash-replay shape: one table's merge committed (its carried
    state dropped the xid) and the decision batch replays with NO
    explicit pending_dir — the default staging dir under the table's
    _meta must be consulted BEFORE the unknown-xid validation raises
    (the default was previously assigned only after that check, so this
    exact replay path failed permanently)."""
    tmp = tempfile.mkdtemp(prefix="p2pc_")
    table = _mk_table(spark, tmp)
    b1 = _frames_df(spark, [
        (0, 1, "R", _rel_payload()),
        (0, 100, "b", codec.encode_begin_prepare(100, 110, 5, 777, "gid-777")),
        (0, 101, "I", _ins(("rA", "p1"), "prepared-value")),
        (0, 109, "P", codec.encode_prepare(109, 110, 5, 777, "gid-777")),
    ])
    registry = RelationRegistry.from_frames(b1)
    m1 = pipe.apply_frames_batch(table, b1, registry,
                                 pending_2pc=pipe.stored_pending_2pc(table))
    assert m1["two_phase"]["staged_rows"] == 1
    default_dir = os.path.join(table.meta_dir, "pending2pc")
    assert os.path.isdir(default_dir)
    # decision replay with EMPTY carried state (the committed table's
    # snapshot already dropped xid 777) and the default staging dir
    b2 = _frames_df(spark, [
        (1, 400, "K", codec.encode_commit_prepared(400, 401, 9, 777, "gid-777")),
    ])
    m2 = pipe.apply_frames_batch(table, b2, registry,
                                 pending_2pc=pipe._empty_pending())
    assert m2["two_phase"]["committed"] == [777]
    rows = {r["repo"]: r["content"] for r in table.read().collect()}
    assert rows == {"rA": "prepared-value"}
    assert not os.path.isdir(default_dir)  # GC after resolution


def test_no_relation_skip_carries_two_phase_transitions(spark):
    """Stream-seeded shape: a batch carrying only 2PC control frames
    (no Relation, no DML) must advance the pending carry — discarding
    the transitions made the NEXT batch's validation raise
    'Prepare/decision for unknown xid'. A Commit Prepared for an EMPTY
    prepared transaction (no staged rows, no in-batch DML) is consumed
    like the managed path consumes it — raising would wedge ingest
    permanently on every retry of the batch; only a decision with
    mergeable evidence fails loudly (next test)."""
    tmp = tempfile.mkdtemp(prefix="p2pc_")
    table = _mk_table(spark, tmp)
    empty_reg = RelationRegistry()  # nothing registered yet
    b1 = _frames_df(spark, [
        (0, 100, "b", codec.encode_begin_prepare(100, 110, 5, 777, "g7")),
        (0, 109, "P", codec.encode_prepare(109, 110, 5, 777, "g7")),
    ])
    m1 = pipe.apply_frames_batch(table, b1, empty_reg,
                                 pending_2pc=pipe.stored_pending_2pc(table))
    assert m1["skipped"] and m1["reason"] == "no-relation"
    assert m1["pending_2pc"]["xids"] == {
        "777": {"gid": "g7", "b_lsn": 100, "segment": 0, "sealed": True}
    }
    # rollback decision for the carried xid in a later no-relation batch
    # (metadata letter 'x' — the stamped-frames contract reserves 'r'
    # for in-chunk Relation messages; the payload byte stays 'r')
    b2 = _frames_df(spark, [
        (1, 200, "x",
         codec.encode_rollback_prepared(110, 210, 5, 9, 777, "g7")),
    ])
    m2 = pipe.apply_frames_batch(table, b2, empty_reg,
                                 pending_2pc=m1["pending_2pc"])
    assert m2["skipped"] and m2["pending_2pc"]["xids"] == {}
    # a COMMIT decision for an EMPTY prepared transaction (b/P carried,
    # nothing staged, no in-batch DML) is consumed without a merge —
    # the xid leaves the pending carry and ingest keeps moving
    b3 = _frames_df(spark, [
        (0, 300, "b", codec.encode_begin_prepare(300, 310, 5, 888, "g8")),
        (0, 309, "P", codec.encode_prepare(309, 310, 5, 888, "g8")),
    ])
    m3 = pipe.apply_frames_batch(table, b3, empty_reg,
                                 pending_2pc=m2["pending_2pc"])
    b4 = _frames_df(spark, [
        (1, 400, "K", codec.encode_commit_prepared(400, 401, 9, 888, "g8")),
    ])
    m4 = pipe.apply_frames_batch(table, b4, empty_reg,
                                 pending_2pc=m3["pending_2pc"])
    assert m4["skipped"] and m4["pending_2pc"]["xids"] == {}


def test_no_relation_commit_with_mergeable_evidence_fails_loudly(spark):
    """The loud-refusal half of the no-relation Commit Prepared rule:
    when the decided transaction HAS mergeable events — DML inside its
    prepared span in this batch, or rows staged by an earlier batch —
    resolving without a Relation schema would silently drop a COMMITTED
    transaction, so the batch must raise."""
    tmp = tempfile.mkdtemp(prefix="p2pc_")
    table = _mk_table(spark, tmp)
    empty_reg = RelationRegistry()
    # in-batch DML evidence: b .. I .. P .. K all in one schema-less batch
    b1 = _frames_df(spark, [
        (0, 100, "b", codec.encode_begin_prepare(100, 110, 5, 777, "g7")),
        (0, 101, "I", _ins(("rX", "pX"), "vX")),
        (0, 109, "P", codec.encode_prepare(109, 110, 5, 777, "g7")),
        (0, 120, "K", codec.encode_commit_prepared(120, 121, 9, 777, "g7")),
    ])
    with pytest.raises(ValueError, match="no registered relation"):
        pipe.apply_frames_batch(table, b1, empty_reg,
                                pending_2pc=pipe.stored_pending_2pc(table))
    # message-only evidence: a committed prepared transaction carrying
    # ONLY a logical message ('M') has deliverable content too — the
    # outbox path stages it like DML, so it must refuse as loudly
    b1m = _frames_df(spark, [
        (0, 200, "b", codec.encode_begin_prepare(200, 210, 5, 778, "g8")),
        (0, 201, "M",
         codec.encode_logical_message(True, 201, "audit", b"payload")),
        (0, 209, "P", codec.encode_prepare(209, 210, 5, 778, "g8")),
        (0, 220, "K", codec.encode_commit_prepared(220, 221, 9, 778, "g8")),
    ])
    with pytest.raises(ValueError, match="no registered relation"):
        pipe.apply_frames_batch(table, b1m, empty_reg,
                                pending_2pc=pipe.stored_pending_2pc(table))
    # staged-rows evidence: a carried sealed xid whose events survive
    # under pending_dir from an earlier batch
    pend_dir = os.path.join(tmp, "pending2pc")
    spark.createDataFrame(
        [(301, "I", RID, 999, 300, 5, 1, None, None, ["rY", "pY", "vY"],
          None, 1, None)],
        schema=decode_op.RAW_SCHEMA,
    ).write.parquet(pend_dir)
    b2 = _frames_df(spark, [
        (1, 400, "K", codec.encode_commit_prepared(400, 401, 9, 999, "g9")),
    ])
    with pytest.raises(ValueError, match="no registered relation"):
        pipe.apply_frames_batch(
            table, b2, empty_reg, pending_dir=pend_dir,
            pending_2pc={"xids": {"999": {"gid": "g9", "b_lsn": 300,
                                          "segment": 1, "sealed": True}},
                         "t_void": {}},
        )
