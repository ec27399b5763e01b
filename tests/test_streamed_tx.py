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


def test_vectorized_strict_names_streaming(spark):
    frames = _mk_frames_df(spark, _stream_rows())
    with pytest.raises(Exception, match="streamed|loop kernel"):
        decode_op.decode_frames_raw(frames, strict=True).collect()


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
                      txns_per_segment=10, stream_pct=50, stream_abort_pct=30)
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
                      truncate_every=7)
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
