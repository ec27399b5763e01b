"""Protocol v2: streamed in-progress transactions (PG14+ streaming=on).

The reference pins proto_version 1 (reference reader.py:360-361) — large
transactions are a 100 TB-scale concern the reference never faces, so
this is a capability extension: Stream Start/Stop chunking with
xid-prefixed in-chunk DML, Stream Commit stamping the buffered events,
Stream Abort discarding them.
"""

from __future__ import annotations

import pytest

from pypgoutput_spark.operators import decode as decode_op
from pypgoutput_spark.wal import codec
from pypgoutput_spark.wal.generator import (
    RELATION_COLUMNS,
    RELATION_ID,
    RELATION_NAME,
    RELATION_NAMESPACE,
)

def _cells(*vals):
    return [("t", v) if v is not None else ("n", None) for v in vals]


def test_codec_stream_messages_roundtrip():
    s = codec.encode_stream_start(4242, first_segment=True)
    assert codec.decode_message(s) == {
        "msg_type": "S", "xid": 4242, "first_segment": True,
    }
    s2 = codec.decode_message(codec.encode_stream_start(4242, first_segment=False))
    assert not s2["first_segment"]
    assert codec.decode_message(codec.encode_stream_stop()) == {"msg_type": "E"}
    c = codec.decode_message(codec.encode_stream_commit(4242, 99, 100, 777000))
    assert c == {
        "msg_type": "c", "xid": 4242, "flags": 0,
        "lsn_commit": 99, "lsn_end": 100, "commit_ts_us": 777000,
    }
    a = codec.decode_message(codec.encode_stream_abort(4242))
    assert a == {"msg_type": "A", "xid": 4242, "subxid": 4242}


def test_codec_stream_xid_wrap_roundtrip():
    v1 = codec.encode_insert(RELATION_ID, _cells("r", "p", "c", "py", "body"))
    v2 = codec.add_stream_xid(v1, 4242)
    assert v2[0:1] == b"I" and len(v2) == len(v1) + 4
    xid, back = codec.strip_stream_xid(v2)
    assert xid == 4242 and back == v1


def _frames(rows):
    return [(seg, lsn, payload[0:1].decode(), bytearray(payload))
            for seg, lsn, payload in rows]


def _mk_frames_df(spark, rows):
    return spark.createDataFrame(
        _frames(rows), schema="segment BIGINT, lsn BIGINT, mtype STRING, payload BINARY"
    )


def _stream_rows():
    """R; one v1 txn; one 2-chunk streamed txn (commits); one aborted
    streamed txn — all in segment 0, LSN-ordered."""
    rel = codec.encode_relation(
        RELATION_ID, RELATION_NAMESPACE, RELATION_NAME, "d", RELATION_COLUMNS
    )
    x1, x2 = 7001, 7002
    rows = [
        (0, 1, rel),
        # plain v1 transaction
        (0, 10, codec.encode_begin(10, 111000, 500)),
        (0, 11, codec.encode_insert(RELATION_ID, _cells("r0", "p0", "c0", "py", "v0"))),
        (0, 12, codec.encode_commit(11, 12, 111000)),
        # streamed transaction, 2 chunks, committed
        (0, 20, codec.encode_stream_start(x1, True)),
        (0, 21, codec.add_stream_xid(
            codec.encode_insert(RELATION_ID, _cells("r1", "p1", "c1", "py", "v1")), x1)),
        (0, 22, codec.add_stream_xid(
            codec.encode_update(RELATION_ID, _cells("r1", "p1", "c2", "py", "v2")), x1)),
        (0, 23, codec.encode_stream_stop()),
        (0, 24, codec.encode_stream_start(x1, False)),
        (0, 25, codec.add_stream_xid(
            codec.encode_delete(RELATION_ID, _cells("r0", "p0", None, None, None)), x1)),
        (0, 26, codec.encode_stream_stop()),
        (0, 27, codec.encode_stream_commit(x1, 26, 27, 222000)),
        # streamed transaction, aborted — its events must vanish
        (0, 30, codec.encode_stream_start(x2, True)),
        (0, 31, codec.add_stream_xid(
            codec.encode_insert(RELATION_ID, _cells("rX", "pX", "cX", "py", "vX")), x2)),
        (0, 32, codec.encode_stream_stop()),
        (0, 33, codec.encode_stream_abort(x2)),
    ]
    return rows


@pytest.mark.parametrize("mode", ["loop", "optimistic"])
def test_streamed_txn_decode(spark, mode):
    frames = _mk_frames_df(spark, _stream_rows())
    raw = decode_op.decode_frames_raw(
        frames, strict=(mode == "loop"),
        vectorized=(mode == "optimistic"),
    )
    rows = {r["lsn"]: r for r in raw.collect()}
    # v1 event decoded normally
    assert rows[11]["op"] == "I" and rows[11]["xid"] == 500
    # committed streamed events: stamped with the stream xid, the Stream
    # Start lsn as begin_lsn, and the Stream Commit timestamp
    for lsn, op in ((21, "I"), (22, "U"), (25, "D")):
        r = rows[lsn]
        assert r["op"] == op and r["xid"] == 7001
        assert r["begin_lsn"] == 20 and r["commit_ts_us"] == 222000
    assert rows[21]["new_vals"] == ["r1", "p1", "c1", "py", "v1"]
    assert rows[25]["before_vals"] == ["r0", "p0", None, None, None]
    # aborted streamed events are gone
    assert 31 not in rows
    assert len(rows) == 4


def test_stream_open_at_partition_end_raises(spark):
    rows = [r for r in _stream_rows() if r[1] <= 23]  # cut inside the stream
    frames = _mk_frames_df(spark, rows)
    with pytest.raises(Exception, match="segment boundaries"):
        decode_op.decode_frames_raw(
            frames.coalesce(1), strict=True, vectorized=False, clustered=True
        ).collect()


def test_vectorized_strict_decodes_streams(spark):
    """The strict vectorized kernel decodes protocol v2 directly (round-5:
    stream-bearing batches no longer pay the loop kernel) — its output is
    row-identical to the loop kernel's."""
    frames = _mk_frames_df(spark, _stream_rows())
    vec = decode_op.decode_frames_raw(frames, strict=True).collect()
    loop = decode_op.decode_frames_raw(
        frames, strict=True, vectorized=False
    ).collect()
    key = lambda r: r["lsn"]  # noqa: E731
    assert sorted([r.asDict() for r in vec], key=lambda d: d["lsn"]) == \
        sorted([r.asDict() for r in loop], key=lambda d: d["lsn"])
    assert {r["lsn"] for r in vec} == {11, 21, 22, 25}


def test_streamed_decode_never_needs_loop_fallback(spark):
    """Pin the kernel choice: with forbid_loop=True (captured at plan
    time) any loop-kernel fallback hard-fails — this stream decodes
    wholly on the vectorized path."""
    frames = _mk_frames_df(spark, _stream_rows())
    rows = decode_op.decode_frames_raw(
        frames, strict=False, forbid_loop=True
    ).collect()
    assert {r["lsn"] for r in rows} == {11, 21, 22, 25}


def _interleaved_rows():
    """Two streamed txns whose chunks INTERLEAVE (the real PG14+
    walsender shape with streaming=on), one v1 txn between chunks."""
    rel = codec.encode_relation(
        RELATION_ID, RELATION_NAMESPACE, RELATION_NAME, "d", RELATION_COLUMNS
    )
    x1, x2 = 8001, 8002
    return [
        (0, 1, rel),
        # x1 chunk 1
        (0, 10, codec.encode_stream_start(x1, True)),
        (0, 11, codec.add_stream_xid(
            codec.encode_insert(RELATION_ID, _cells("a", "p1", "c1", "py", "v1")), x1)),
        (0, 12, codec.encode_stream_stop()),
        # x2 chunk 1 (interleaved while x1 is in flight)
        (0, 20, codec.encode_stream_start(x2, True)),
        (0, 21, codec.add_stream_xid(
            codec.encode_insert(RELATION_ID, _cells("b", "p2", "c2", "py", "v2")), x2)),
        (0, 22, codec.encode_stream_stop()),
        # a plain v1 txn between chunks
        (0, 30, codec.encode_begin(30, 111000, 600)),
        (0, 31, codec.encode_insert(RELATION_ID, _cells("c", "p3", "c3", "py", "v3"))),
        (0, 32, codec.encode_commit(31, 32, 111000)),
        # x1 chunk 2 (continuation), then commits in x2, x1 order
        (0, 40, codec.encode_stream_start(x1, False)),
        (0, 41, codec.add_stream_xid(
            codec.encode_update(RELATION_ID, _cells("a", "p1", "c9", "py", "v9")), x1)),
        (0, 42, codec.encode_stream_stop()),
        (0, 50, codec.encode_stream_commit(x2, 49, 50, 222000)),
        (0, 51, codec.encode_stream_commit(x1, 50, 51, 333000)),
    ]


@pytest.mark.parametrize("mode", ["loop", "strict-vec", "optimistic"])
def test_interleaved_streams_decode(spark, mode):
    frames = _mk_frames_df(spark, _interleaved_rows())
    raw = decode_op.decode_frames_raw(
        frames,
        strict=(mode != "optimistic"),
        vectorized=(mode != "loop"),
        forbid_loop=(mode == "optimistic"),
    )
    rows = {r["lsn"]: r for r in raw.collect()}
    assert set(rows) == {11, 21, 31, 41}
    # each stream's events stamped with ITS xid / first-S lsn / commit ts
    assert (rows[11]["xid"], rows[11]["begin_lsn"], rows[11]["commit_ts_us"]) \
        == (8001, 10, 333000)
    assert (rows[41]["xid"], rows[41]["begin_lsn"], rows[41]["commit_ts_us"]) \
        == (8001, 10, 333000)
    assert (rows[21]["xid"], rows[21]["begin_lsn"], rows[21]["commit_ts_us"]) \
        == (8002, 20, 222000)
    assert rows[31]["xid"] == 600  # v1 txn between chunks unaffected


@pytest.mark.parametrize("mode", ["loop", "strict-vec"])
def test_interleaved_abort_discards_only_that_stream(spark, mode):
    rows_in = [r for r in _interleaved_rows() if r[1] != 50]
    rows_in.append((0, 50, codec.encode_stream_abort(8002)))
    rows_in.sort(key=lambda r: r[1])
    frames = _mk_frames_df(spark, rows_in)
    raw = decode_op.decode_frames_raw(frames, vectorized=(mode != "loop"))
    rows = {r["lsn"]: r for r in raw.collect()}
    assert set(rows) == {11, 31, 41}  # x2's event (lsn 21) vanished


def _subxid_rows():
    """One streamed txn with a savepoint: subxid 9100 aborts, the outer
    transaction's events commit (pgoutput v2 subxid-scoped Stream
    Abort)."""
    rel = codec.encode_relation(
        RELATION_ID, RELATION_NAMESPACE, RELATION_NAME, "d", RELATION_COLUMNS
    )
    x, sub = 9001, 9100
    return [
        (0, 1, rel),
        (0, 10, codec.encode_stream_start(x, True)),
        # outer txn's change (embedded xid = top-level xid)
        (0, 11, codec.add_stream_xid(
            codec.encode_insert(RELATION_ID, _cells("o", "p1", "c1", "py", "v1")), x)),
        # subtransaction's changes (embedded xid = subxid)
        (0, 12, codec.add_stream_xid(
            codec.encode_insert(RELATION_ID, _cells("s", "p2", "c2", "py", "v2")), sub)),
        (0, 13, codec.add_stream_xid(
            codec.encode_update(RELATION_ID, _cells("s", "p2", "c3", "py", "v3")), sub)),
        (0, 14, codec.encode_stream_stop()),
        # savepoint rolls back: abort names the SUBxid, not the txn
        (0, 20, codec.encode_stream_abort(x, subxid=sub)),
        (0, 21, codec.encode_stream_start(x, False)),
        (0, 22, codec.add_stream_xid(
            codec.encode_insert(RELATION_ID, _cells("o", "p3", "c4", "py", "v4")), x)),
        (0, 23, codec.encode_stream_stop()),
        (0, 30, codec.encode_stream_commit(x, 29, 30, 444000)),
    ]


@pytest.mark.parametrize("mode", ["loop", "strict-vec", "optimistic"])
def test_subxid_abort_discards_only_subtransaction(spark, mode):
    frames = _mk_frames_df(spark, _subxid_rows())
    raw = decode_op.decode_frames_raw(
        frames,
        strict=(mode != "optimistic"),
        vectorized=(mode != "loop"),
        forbid_loop=(mode == "optimistic"),
    )
    rows = {r["lsn"]: r for r in raw.collect()}
    # subxid 9100's events (12, 13) rolled back; outer events committed
    assert set(rows) == {11, 22}
    for r in rows.values():
        assert r["xid"] == 9001 and r["begin_lsn"] == 10
        assert r["commit_ts_us"] == 444000


@pytest.mark.parametrize("mode", ["loop", "strict-vec"])
def test_missequenced_foreign_chunk_raises(spark, mode):
    """An in-chunk message whose embedded xid is a DIFFERENT open
    stream's top-level xid is a mis-sequenced chunk — silently
    committing it with the wrong transaction would corrupt the table."""
    rel = codec.encode_relation(
        RELATION_ID, RELATION_NAMESPACE, RELATION_NAME, "d", RELATION_COLUMNS
    )
    x1, x2 = 8101, 8102
    rows = [
        (0, 1, rel),
        (0, 10, codec.encode_stream_start(x1, True)),
        (0, 11, codec.encode_stream_stop()),
        (0, 20, codec.encode_stream_start(x2, True)),
        # x1's message inside x2's chunk
        (0, 21, codec.add_stream_xid(
            codec.encode_insert(RELATION_ID, _cells("m", "p", "c", "py", "v")), x1)),
        (0, 22, codec.encode_stream_stop()),
        (0, 30, codec.encode_stream_commit(x2, 29, 30, 0)),
        (0, 31, codec.encode_stream_commit(x1, 30, 31, 0)),
    ]
    with pytest.raises(Exception, match="mis-sequenced"):
        decode_op.decode_frames_raw(
            _mk_frames_df(spark, rows), strict=True,
            vectorized=(mode != "loop"),
        ).collect()


def test_dead_letter_inside_aborted_stream_discarded(spark):
    """ADVICE r4: a per-message decode error inside a stream block must
    NOT leave a quarantine row if that stream later aborts — the event
    never logically existed. Committed streams DO emit their buffered
    dead letters."""
    import struct

    rel = codec.encode_relation(
        RELATION_ID, RELATION_NAMESPACE, RELATION_NAME, "d", RELATION_COLUMNS
    )
    xa, xc = 8201, 8202
    # Insert with a bad tuple marker ('Z' instead of 'N') — raises in the
    # loop kernel, so it is a dead-letter candidate
    bad_v1 = b"I" + struct.pack(">i", RELATION_ID) + b"Z\x00\x00"
    rows = [
        (0, 1, rel),
        (0, 10, codec.encode_stream_start(xa, True)),
        (0, 11, codec.add_stream_xid(bad_v1, xa)),
        (0, 12, codec.encode_stream_stop()),
        (0, 13, codec.encode_stream_abort(xa)),
        (0, 20, codec.encode_stream_start(xc, True)),
        (0, 21, codec.add_stream_xid(bad_v1, xc)),
        (0, 22, codec.encode_stream_stop()),
        (0, 23, codec.encode_stream_commit(xc, 22, 23, 0)),
    ]
    raw = decode_op.decode_frames_raw(
        _mk_frames_df(spark, rows), strict=False, vectorized=False
    )
    got = raw.collect()
    # exactly ONE dead letter: the committed stream's; the aborted
    # stream's quarantine candidate vanished with its transaction
    assert [r["lsn"] for r in got if r["op"] == "E"] == [21]


def test_streamed_stream_ingest_matches_oracle(spark, tmp_path):
    """Structured-Streaming ingest of a v2 stream: segment-chunked files
    keep every stream block within one micro-batch partition (the
    documented contract), strict=False routes stream batches through the
    loop kernel — final state ≡ oracle."""
    import duckdb

    from pypgoutput_spark.lake.table import LakeTable
    from pypgoutput_spark.streaming import pipeline
    from pypgoutput_spark.wal import generator as gen

    p = gen.GenParams(n_txns=40, ops_per_txn=5, toast_pct=25,
                      txns_per_segment=10, stream_pct=50, stream_abort_pct=30,
                      interleave_streams=True)
    frames_dir = str(tmp_path / "frames")
    frames = gen.spark_frames_df(spark, p)
    for seg in range(4):
        (
            frames.filter(f"segment = {seg}")
            .coalesce(1).write.mode("append").parquet(frames_dir)
        )
    table = LakeTable.create(
        spark, str(tmp_path / "lake"),
        schema=[(c, "string") for c in gen.ALL_COLUMNS],
        key_cols=list(gen.KEY_COLUMNS), n_buckets=8,
    )
    q = pipeline.stream_ingest(
        spark, frames_dir, table, str(tmp_path / "ckpt"),
        max_files_per_trigger=1, clustered=True,
    )
    q.awaitTermination(300)
    got = table.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    want = (
        duckdb.sql(gen.duckdb_final_state_sql(p, with_sha=False))
        .df().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert got[want.columns.tolist()].equals(want)


def test_streamed_pipeline_matches_oracle(spark, tmp_path):
    """Generator-driven e2e: 40% streamed txns (25% of those abort),
    TOAST cells included, 3 micro-batches with resume semantics — final
    lake state ≡ the serial DuckDB oracle with aborted txns excluded."""
    import duckdb

    from pypgoutput_spark.lake.table import LakeTable
    from pypgoutput_spark.streaming import pipeline
    from pypgoutput_spark.wal import generator as gen

    p = gen.GenParams(n_txns=60, ops_per_txn=6, toast_pct=30,
                      txns_per_segment=6, stream_pct=40, stream_abort_pct=25)
    frames = gen.spark_frames_df(spark, p)
    mtypes = {r["mtype"] for r in frames.select("mtype").distinct().collect()}
    assert {"S", "E", "c", "A"} <= mtypes, "fixture must exercise the v2 grammar"

    table = LakeTable.create(
        spark, str(tmp_path / "lake"),
        schema=[(c, "string") for c in gen.ALL_COLUMNS],
        key_cols=list(gen.KEY_COLUMNS), n_buckets=8,
    )
    pipeline.run_ingest(spark, frames, table, n_batches=3, strict=False)
    got = table.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    want = (
        duckdb.sql(gen.duckdb_final_state_sql(p, with_sha=False))
        .df().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert got[want.columns.tolist()].equals(want)


def test_interleaved_generator_pipeline_matches_oracle(spark, tmp_path):
    """Generator-driven e2e with interleave_streams: adjacent streamed
    txns' chunks alternate (S1 a1 E S2 a2 E S1' b1 E S2' b2 E c1 c2),
    aborts included — final lake state ≡ the serial DuckDB oracle, and
    the whole stream decodes on the VECTORIZED path (forbid_loop pinned
    at the decode level below)."""
    import duckdb

    from pypgoutput_spark.lake.table import LakeTable
    from pypgoutput_spark.streaming import pipeline
    from pypgoutput_spark.wal import generator as gen

    p = gen.GenParams(n_txns=60, ops_per_txn=7, toast_pct=25,
                      txns_per_segment=6, stream_pct=50, stream_abort_pct=25,
                      interleave_streams=True)
    frames = gen.spark_frames_df(spark, p)
    # the fixture must actually interleave: some segment has a second
    # chunk-start before the first stream's commit
    segs = frames.orderBy("segment", "lsn").select("segment", "mtype").collect()
    by_seg: dict = {}
    for r in segs:
        by_seg.setdefault(r["segment"], []).append(r["mtype"])
    assert any(
        "".join(ms).count("ES") > 0 and
        any(a == "E" and b == "S" for a, b in zip(ms, ms[1:]))
        for ms in by_seg.values()
    )

    # kernel pin: the interleaved stream decodes wholly vectorized
    raw = decode_op.decode_frames_raw(frames, strict=False, forbid_loop=True)
    assert raw.count() > 0

    table = LakeTable.create(
        spark, str(tmp_path / "lake"),
        schema=[(c, "string") for c in gen.ALL_COLUMNS],
        key_cols=list(gen.KEY_COLUMNS), n_buckets=8,
    )
    pipeline.run_ingest(spark, frames, table, n_batches=3, strict=False)
    got = table.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    want = (
        duckdb.sql(gen.duckdb_final_state_sql(p, with_sha=False))
        .df().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert got[want.columns.tolist()].equals(want)


def test_in_stream_truncate_refused_even_nonstrict(spark):
    """A Truncate inside a stream block must fail the batch loudly in
    BOTH modes — quarantining it would silently corrupt the table."""
    x = 7010
    rel = codec.encode_relation(
        RELATION_ID, RELATION_NAMESPACE, RELATION_NAME, "d", RELATION_COLUMNS
    )
    rows = [
        (0, 1, rel),
        (0, 10, codec.encode_stream_start(x, True)),
        (0, 11, codec.add_stream_xid(codec.encode_truncate([RELATION_ID]), x)),
        (0, 12, codec.encode_stream_stop()),
        (0, 13, codec.encode_stream_commit(x, 12, 13, 0)),
    ]
    for strict in (True, False):
        with pytest.raises(Exception, match="not supported"):
            decode_op.decode_frames_raw(
                _mk_frames_df(spark, rows), strict=strict, vectorized=False
            ).collect()


def test_streamed_with_truncates_matches_oracle(spark, tmp_path):
    """stream_pct + truncate_every together: streamed txns draw plain DML
    (never truncates), in-stream frames are mtype-stamped lowercase so
    the driver's truncate-cut metadata path never misparses a v2
    payload — end-to-end state ≡ oracle."""
    import duckdb

    from pypgoutput_spark.lake.table import LakeTable
    from pypgoutput_spark.streaming import pipeline
    from pypgoutput_spark.wal import generator as gen

    p = gen.GenParams(n_txns=60, ops_per_txn=6, toast_pct=25,
                      txns_per_segment=6, stream_pct=40, stream_abort_pct=25,
                      truncate_every=7, interleave_streams=True)
    frames = gen.spark_frames_df(spark, p)
    by_mtype = {
        r["mtype"]: r["count"]
        for r in frames.groupBy("mtype").count().collect()
    }
    assert by_mtype.get("T", 0) > 0, "v1 truncates present"
    assert "t" not in by_mtype, "no in-stream truncates generated"
    assert by_mtype.get("i", 0) > 0, "in-stream DML stamped lowercase"

    table = LakeTable.create(
        spark, str(tmp_path / "lake"),
        schema=[(c, "string") for c in gen.ALL_COLUMNS],
        key_cols=list(gen.KEY_COLUMNS), n_buckets=8,
    )
    pipeline.run_ingest(spark, frames, table, n_batches=3, strict=False)
    got = table.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    want = (
        duckdb.sql(gen.duckdb_final_state_sql(p, with_sha=False))
        .df().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert got[want.columns.tolist()].equals(want)


def test_stream_chunk_split_across_arrow_batches_vectorized(spark):
    """The core purpose of the batch grouping: a stream whose chunks span
    Arrow-batch boundaries must still decode on the VECTORIZED path
    (batches coalesce until every stream closes — forbid_loop pins that
    no loop fallback is needed)."""
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        frames = _mk_frames_df(spark, _interleaved_rows())
        rows = {r["lsn"]: r for r in decode_op.decode_frames_raw(
            frames.coalesce(1), strict=False, forbid_loop=True,
            clustered=True,
        ).collect()}
        assert set(rows) == {11, 21, 31, 41}
        assert (rows[41]["xid"], rows[41]["commit_ts_us"]) == (8001, 333000)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


def test_corrupt_in_chunk_frame_quarantines_via_group_fallback(spark):
    """Optimistic mode: a corrupt frame INSIDE a committed stream fails
    the vectorized group, the group re-decodes through the loop kernel,
    and the dead letter (buffered with the stream) is emitted at commit —
    clean events of the same stream survive."""
    import struct

    rel = codec.encode_relation(
        RELATION_ID, RELATION_NAMESPACE, RELATION_NAME, "d", RELATION_COLUMNS
    )
    x = 8301
    bad_v1 = b"I" + struct.pack(">i", RELATION_ID) + b"Z\x00\x00"
    rows_in = [
        (0, 1, rel),
        (0, 10, codec.encode_stream_start(x, True)),
        (0, 11, codec.add_stream_xid(
            codec.encode_insert(RELATION_ID, _cells("ok", "p", "c", "py", "v")), x)),
        (0, 12, codec.add_stream_xid(bad_v1, x)),
        (0, 13, codec.encode_stream_stop()),
        (0, 14, codec.encode_stream_commit(x, 13, 14, 555000)),
    ]
    got = decode_op.decode_frames_raw(
        _mk_frames_df(spark, rows_in), strict=False
    ).collect()
    by_op = {r["op"]: r for r in got}
    assert by_op["I"]["lsn"] == 11 and by_op["I"]["xid"] == x
    assert by_op["E"]["lsn"] == 12 and "marker" in by_op["E"]["error"]
    assert len(got) == 2


def _in_stream_relation_frames(spark):
    """Fixture frames whose ONLY Relation message arrives in-chunk."""
    x1, x2 = 8401, 8402
    rel = codec.encode_relation(
        RELATION_ID, RELATION_NAMESPACE, RELATION_NAME, "d", RELATION_COLUMNS
    )
    rows = [
        # NOTE: no v1 'R' frame at all — the only Relation is in-chunk
        (0, 10, "S", codec.encode_stream_start(x1, True)),
        (0, 11, "r", codec.add_stream_xid(rel, x1)),
        (0, 12, "i", codec.add_stream_xid(
            codec.encode_insert(RELATION_ID, _cells("a", "p", "c", "py", "v")), x1)),
        (0, 13, "E", codec.encode_stream_stop()),
        (0, 14, "c", codec.encode_stream_commit(x1, 13, 14, 111000)),
        # an ABORTED stream introduces nothing new but its R must persist
        (0, 20, "S", codec.encode_stream_start(x2, True)),
        (0, 21, "r", codec.add_stream_xid(rel, x2)),
        (0, 22, "E", codec.encode_stream_stop()),
        (0, 23, "A", codec.encode_stream_abort(x2)),
        # later v1 DML relies on the in-chunk R having registered
        (0, 30, "B", codec.encode_begin(30, 222000, 700)),
        (0, 31, "I", codec.encode_insert(
            RELATION_ID, _cells("b", "p2", "c2", "py", "v2"))),
        (0, 32, "C", codec.encode_commit(31, 32, 222000)),
    ]
    return x1, spark.createDataFrame(
        [(seg, lsn, mt, bytearray(pl)) for seg, lsn, mt, pl in rows],
        schema="segment BIGINT, lsn BIGINT, mtype STRING, payload BINARY",
    )


def test_in_stream_relation_registers(spark):
    """PG14+ sends the Relation message for a table FIRST touched by a
    streamed transaction INSIDE the chunk (stamped 'r' at capture, subxid
    prefix). The registry must register it (stripped) at its LSN so the
    stream's own DML decodes — and it survives even an abort (pgoutput's
    relation cache is not transactional)."""
    x1, frames = _in_stream_relation_frames(spark)
    for vectorized in (False, True):
        got = {r["lsn"]: r for r in decode_op.decode_frames_raw(
            frames, strict=True, vectorized=vectorized
        ).collect()}
        assert set(got) == {12, 31}, (vectorized, sorted(got))
        assert got[12]["xid"] == x1 and got[12]["schema_version"] is not None
        assert got[31]["xid"] == 700


def test_in_stream_relation_pipeline_e2e(spark, tmp_path):
    """The in-chunk 'r' Relation flows through the FULL ingest path:
    run_ingest's registry bootstrap, apply_frames_batch's stats-scan
    R-cohort predicate, decode, merge — final table state holds both the
    streamed insert and the later v1 insert that depends on the in-chunk
    R having registered."""
    from pypgoutput_spark.lake.table import LakeTable
    from pypgoutput_spark.streaming import pipeline
    from pypgoutput_spark.wal.generator import ALL_COLUMNS, KEY_COLUMNS

    _, frames = _in_stream_relation_frames(spark)
    table = LakeTable.create(
        spark, str(tmp_path / "lake"),
        schema=[(c, "string") for c in ALL_COLUMNS],
        key_cols=list(KEY_COLUMNS), n_buckets=4,
    )
    pipeline.run_ingest(spark, frames, table, n_batches=1, strict=True)
    got = sorted(
        (r["repo"], r["path"], r["content"])
        for r in table.read().collect()
    )
    assert got == [("a", "p", "v"), ("b", "p2", "v2")]
    assert table.watermark_lsn == 32


def test_truncated_stream_commit_never_destroys_buffered_events(spark):
    """A Stream Commit truncated below its 30-byte layout must NOT take
    the stream's buffered DML with it (round-5 review: the loop kernel
    deleted the buffer before parsing the commit timestamp, so in
    strict=False the committed transaction vanished silently). Now the
    frame parses fully before any state mutation: the corrupt commit
    dead-letters alone, the stream stays buffered, and the partition-end
    guard raises — loud failure, zero silent loss."""
    rel = codec.encode_relation(
        RELATION_ID, RELATION_NAMESPACE, RELATION_NAME, "d", RELATION_COLUMNS
    )
    x = 7301
    rows = [
        (0, 1, rel),
        (0, 10, codec.encode_stream_start(x, True)),
        (0, 11, codec.add_stream_xid(
            codec.encode_insert(RELATION_ID, _cells("r", "p", "c", "py", "v")), x)),
        (0, 12, codec.encode_stream_stop()),
        (0, 13, codec.encode_stream_commit(x, 12, 13, 111000)[:10]),
    ]
    frames = _mk_frames_df(spark, rows).coalesce(1)
    for strict in (True, False):
        for vectorized in (None, False):
            # strict: the parse error surfaces directly; strict=False:
            # the commit dead-letters alone and the STILL-BUFFERED
            # stream trips the partition-end guard — never a silent
            # empty result
            with pytest.raises(
                Exception,
                match="segment boundaries|truncated|at least 30 bytes",
            ):
                decode_op.decode_frames_raw(
                    frames, strict=strict, vectorized=vectorized, clustered=True
                ).collect()


def test_codec_stream_abort_v4_roundtrip():
    """Protocol v4 (PG16 streaming=parallel): Stream Abort carries the
    abort LSN + abort timestamp after the v2 xid/subxid body."""
    m = codec.decode_message(
        codec.encode_stream_abort(4242, abort_lsn=99, abort_ts_us=777000)
    )
    assert m == {
        "msg_type": "A", "xid": 4242, "subxid": 4242,
        "abort_lsn": 99, "abort_ts_us": 777000,
    }
    # subxid-scoped v4 abort
    m = codec.decode_message(
        codec.encode_stream_abort(4242, 4300, abort_lsn=98, abort_ts_us=1)
    )
    assert (m["subxid"], m["abort_lsn"]) == (4300, 98)
    # half a trailer is a caller bug, not a wire form
    with pytest.raises(ValueError, match="BOTH"):
        codec.encode_stream_abort(4242, abort_lsn=99)
    # v2 form still decodes without the trailer keys
    assert "abort_lsn" not in codec.decode_message(codec.encode_stream_abort(1))


@pytest.mark.parametrize("mode", ["loop", "strict-vec", "optimistic"])
def test_v4_abort_decodes_on_all_kernels(spark, mode):
    """A v4 Stream Abort discards its stream on every kernel — the
    trailer is decode-transparent (fixed-offset v2 prefix)."""
    rows = [
        r if r[1] != 33 else
        (0, 33, codec.encode_stream_abort(7002, abort_lsn=32, abort_ts_us=5))
        for r in _stream_rows()
    ]
    frames = _mk_frames_df(spark, rows)
    raw = decode_op.decode_frames_raw(
        frames,
        strict=(mode != "optimistic"),
        vectorized=(mode != "loop"),
        forbid_loop=(mode == "optimistic"),
    )
    assert {r["lsn"] for r in raw.collect()} == {11, 21, 22, 25}


def test_generated_v4_abort_stream_matches_oracle(spark, tmp_path):
    """abort_v4=True: the generator emits PG16-form aborts; the replay
    still matches the serial oracle (aborted txns vanish either way)."""
    import duckdb

    from pypgoutput_spark.lake.table import LakeTable
    from pypgoutput_spark.streaming import pipeline
    from pypgoutput_spark.wal import generator as gen

    p = gen.GenParams(n_txns=40, ops_per_txn=5, toast_pct=25,
                      txns_per_segment=10, stream_pct=50,
                      stream_abort_pct=30, abort_v4=True)
    frames = gen.spark_frames_df(spark, p)
    # the wire really is the 25-byte v4 form
    a = frames.filter("mtype = 'A'").limit(1).collect()
    assert a and len(bytes(a[0]["payload"])) == 25
    m = codec.decode_message(bytes(a[0]["payload"]))
    assert "abort_lsn" in m and "abort_ts_us" in m
    table = LakeTable.create(
        spark, str(tmp_path / "lake"),
        schema=[(c, "string") for c in gen.ALL_COLUMNS],
        key_cols=list(gen.KEY_COLUMNS), n_buckets=8,
    )
    pipeline.run_ingest(spark, frames, table, n_batches=3)
    got = table.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    want = (
        duckdb.sql(gen.duckdb_final_state_sql(p, with_sha=False))
        .df().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert got[want.columns.tolist()].equals(want)
