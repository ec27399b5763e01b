"""Logical decoding messages ('M', pg_logical_emit_message) — the
transactional-outbox carrier.

The reference decoder predates 'M' support (reference decoders.py handles
B/C/O/R/Y/I/U/D/T only), so this is parity-plus, like the v2 stream
grammar: a transactional message is stamped with its governing
transaction and vanishes with an abort; a non-transactional message is
surfaced immediately with NULL transaction stamps even when it appears
inside a B..C block.
"""

from __future__ import annotations

import pytest

from pypgoutput_spark.operators import decode as decode_op
from pypgoutput_spark.wal import codec
from pypgoutput_spark.wal.generator import (
    RELATION_COLUMNS,
    RELATION_ID,
    RELATION_NAMESPACE,
    RELATION_NAME,
)


def _cells(*vals):
    return [("t", v) if v is not None else ("n", None) for v in vals]


def _mk_frames_df(spark, rows):
    return spark.createDataFrame(
        [(seg, lsn, payload[0:1].decode(), bytearray(payload))
         for seg, lsn, payload in rows],
        schema="segment BIGINT, lsn BIGINT, mtype STRING, payload BINARY",
    )


def test_codec_logical_message_roundtrip():
    m = codec.encode_logical_message(True, 4200, "outbox", b'{"id":7}')
    assert m[0:1] == b"M"
    d = codec.decode_message(m)
    assert d == {
        "msg_type": "M", "flags": 1, "transactional": True,
        "message_lsn": 4200, "prefix": "outbox", "content": b'{"id":7}',
    }
    d2 = codec.decode_message(
        codec.encode_logical_message(False, 77, "audit", b"")
    )
    assert d2["transactional"] is False and d2["content"] == b""
    assert d2["prefix"] == "audit"


def test_codec_logical_message_corrupt_frames_raise_typed():
    good = codec.encode_logical_message(True, 1, "p", b"xy")
    with pytest.raises(ValueError):
        codec.decode_message(good[:10])  # truncated header
    # missing nul terminator
    broken = good[:10] + b"noterminator"
    with pytest.raises(ValueError):
        codec.decode_message(broken)
    # content length overruns the frame
    over = bytearray(good)
    over[-6] = 0x7F  # blow up the Int32 length
    with pytest.raises(ValueError):
        codec.decode_message(bytes(over))


def _message_rows():
    """R; txn1 (I + transactional M + non-transactional M inside the
    block); a standalone non-transactional M between txns; a committed
    streamed txn with an in-chunk M; an aborted streamed txn with an
    in-chunk M (must vanish)."""
    rel = codec.encode_relation(
        RELATION_ID, RELATION_NAMESPACE, RELATION_NAME, "d", RELATION_COLUMNS
    )
    x1, x2 = 8801, 8802
    return [
        (0, 1, rel),
        # plain txn carrying both message kinds
        (0, 10, codec.encode_begin(10, 111000, 600)),
        (0, 11, codec.encode_insert(RELATION_ID, _cells("r0", "p0", "c0", "py", "v0"))),
        (0, 12, codec.encode_logical_message(True, 12, "outbox", b'{"k":1}')),
        (0, 13, codec.encode_logical_message(False, 13, "audit", b"tick")),
        (0, 14, codec.encode_commit(13, 14, 111000)),
        # non-transactional message outside any txn
        (0, 20, codec.encode_logical_message(False, 20, "audit", b"tock")),
        # committed streamed txn with an in-chunk message
        (0, 30, codec.encode_stream_start(x1, True)),
        (0, 31, codec.add_stream_xid(
            codec.encode_insert(RELATION_ID, _cells("r1", "p1", "c1", "py", "v1")), x1)),
        (0, 32, codec.add_stream_xid(
            codec.encode_logical_message(True, 32, "outbox", b'{"k":2}'), x1)),
        (0, 33, codec.encode_stream_stop()),
        (0, 34, codec.encode_stream_commit(x1, 33, 34, 222000)),
        # aborted streamed txn with an in-chunk message — all gone
        (0, 40, codec.encode_stream_start(x2, True)),
        (0, 41, codec.add_stream_xid(
            codec.encode_logical_message(True, 41, "outbox", b'{"k":3}'), x2)),
        (0, 42, codec.encode_stream_stop()),
        (0, 43, codec.encode_stream_abort(x2)),
    ]


@pytest.mark.parametrize("mode", ["loop", "strict_vec", "optimistic"])
def test_message_decode_all_kernels(spark, mode):
    frames = _mk_frames_df(spark, _message_rows())
    raw = decode_op.decode_frames_raw(
        frames,
        strict=(mode != "optimistic"),
        vectorized=(mode != "loop"),
    )
    rows = {r["lsn"]: r for r in raw.collect()}
    # transactional message inside txn1: stamped with its transaction
    m = rows[12]
    assert m["op"] == "M" and m["before_kind"] == "t"
    assert m["xid"] == 600 and m["begin_lsn"] == 10
    assert m["commit_ts_us"] == 111000
    assert m["new_vals"] == ["outbox", '{"k":1}']
    assert m["relation_id"] is None and m["schema_version"] is None
    # non-transactional message INSIDE the block: NULL stamps
    m = rows[13]
    assert m["op"] == "M" and m["before_kind"] == "n"
    assert m["xid"] is None and m["begin_lsn"] is None
    assert m["new_vals"] == ["audit", "tick"]
    # non-transactional message between txns
    m = rows[20]
    assert m["op"] == "M" and m["xid"] is None
    assert m["new_vals"] == ["audit", "tock"]
    # in-chunk message of the committed stream: stream stamps
    m = rows[32]
    assert m["op"] == "M" and m["before_kind"] == "t"
    assert m["xid"] == 8801 and m["begin_lsn"] == 30
    assert m["commit_ts_us"] == 222000
    assert m["new_vals"] == ["outbox", '{"k":2}']
    # the aborted stream's message vanished with its events
    assert 41 not in rows
    # DML events unaffected
    assert rows[11]["op"] == "I" and rows[31]["op"] == "I"
    assert len(rows) == 6


def test_message_corrupt_content_dead_letters_non_strict(spark):
    """A message whose content length overruns the frame quarantines as
    op='E' under strict=False instead of tearing the batch down."""
    rows = _message_rows()
    bad = bytearray(codec.encode_logical_message(True, 50, "outbox", b"xy"))
    bad[-6] = 0x7F  # content length now overruns
    rows.append((0, 50, bytes(bad)))
    frames = _mk_frames_df(spark, rows)
    raw = decode_op.decode_frames_raw(frames, strict=False)
    got = {r["lsn"]: r for r in raw.collect()}
    assert got[50]["op"] == "E" and "overruns" in got[50]["error"]
    assert got[12]["op"] == "M"  # clean messages still decode
    # strict mode raises a typed error instead
    import pyspark

    with pytest.raises(pyspark.errors.PySparkException):
        decode_op.decode_frames_raw(frames, strict=True).collect()


SF = "/root/testdata/sf0.001"


def test_outbox_entry_matches_oracle(spark):
    """The driver-gated entry at sf0.001: Spark decode ≡ the WAL-free
    DuckDB draw replay — delivered messages only, stamps included."""
    import duckdb
    import pandas as pd

    from pypgoutput_spark.functions.detsql import DUCKDB
    from pypgoutput_spark.operators import outbox as O

    got = (
        O.q_outbox_messages(spark, SF).toPandas()
        .sort_values("lsn").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    want = (
        con.execute(O.outbox_messages_oracle(DUCKDB)).df()
        .sort_values("lsn").reset_index(drop=True)
    )
    assert len(got) == len(want) and len(got) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)].astype(str),
        want[sorted(got.columns)].astype(str),
        check_dtype=False,
    )
    # the fixture exercised every band: transactional + audit messages
    # delivered, and at least one aborted transaction's message dropped
    assert got["transactional"].any() and (~got["transactional"]).any()
    pdf = O.encode_outbox_frames(SF)
    n_m_frames = (pdf["mtype"].isin(["M", "m"])).sum()
    assert n_m_frames > len(got), "some emitted messages were aborted away"


def test_outbox_frames_shape():
    """Fixture invariants: one R; every streamed row's chunk closes in
    its segment; plain rows carry B..C; in-chunk frames are stamped
    lowercase."""
    from pypgoutput_spark.operators import outbox as O

    pdf = O.encode_outbox_frames(SF).sort_values("lsn")
    assert (pdf["mtype"] == "R").sum() == 1
    assert pdf["lsn"].is_unique
    assert set(pdf["mtype"]) <= {"R", "B", "C", "I", "M", "S", "E", "c", "A", "i", "m"}
    n_s = (pdf["mtype"] == "S").sum()
    assert n_s == (pdf["mtype"] == "E").sum()
    assert n_s == ((pdf["mtype"] == "c").sum() + (pdf["mtype"] == "A").sum())
    # streams never straddle segments: per segment, S/E counts balance
    for _seg, g in pdf.groupby("segment"):
        assert (g["mtype"] == "S").sum() == (g["mtype"] == "E").sum()


def test_outbox_sink_delivery_and_replay(spark, tmp_path):
    """run_ingest(messages_dir=...): messages delivered alongside the
    merge out of one decode pass; a fully-replayed second run appends
    nothing (watermark skip); a crash-replay double-append collapses
    exactly under read_messages (identity = LSN)."""
    import duckdb
    import pandas as pd

    from pypgoutput_spark.functions.detsql import DUCKDB
    from pypgoutput_spark.lake.table import LakeTable
    from pypgoutput_spark.operators import outbox as O
    from pypgoutput_spark.streaming import pipeline as P
    from pypgoutput_spark.wal.generator import FRAMES_SCHEMA

    frames = spark.createDataFrame(
        O.encode_outbox_frames(SF), schema=FRAMES_SCHEMA
    )
    mdir = str(tmp_path / "messages")

    def mk_table(name):
        return LakeTable.create(
            spark, str(tmp_path / name),
            schema=[("doc_id", "string"), ("lang", "string")],
            key_cols=["doc_id"], n_buckets=8,
        )

    t1 = mk_table("lake1")
    ms = P.run_ingest(spark, frames, t1, relation_id=O.REL_ID,
                      n_batches=4, messages_dir=mdir)
    n_delivered = sum(m.get("messages", 0) for m in ms)
    assert n_delivered > 0

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    want = (
        con.execute(O.outbox_messages_oracle(DUCKDB)).df()
        .sort_values("lsn").reset_index(drop=True)
    )
    assert n_delivered == len(want)

    def check():
        got = (
            P.read_messages(spark, mdir)
            .select("lsn", "xid", "commit_ts_us", "transactional",
                    "prefix", "content")
            .toPandas().sort_values("lsn").reset_index(drop=True)
        )
        assert len(got) == len(want)
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)].astype(str),
            want[sorted(got.columns)].astype(str),
            check_dtype=False,
        )

    check()
    # fully-replayed run: watermark skips every frame — nothing appended
    ms2 = P.run_ingest(spark, frames, t1, relation_id=O.REL_ID,
                       n_batches=4, messages_dir=mdir)
    assert all(m.get("skipped") for m in ms2)
    check()
    # crash-replay shape: the same stream appended AGAIN (fresh table,
    # same sink) — duplicates on disk, exact set after the LSN dedup
    P.run_ingest(spark, frames, mk_table("lake2"), relation_id=O.REL_ID,
                 n_batches=4, messages_dir=mdir)
    raw_rows = spark.read.parquet(mdir).count()
    assert raw_rows == 2 * len(want)
    check()


def test_read_messages_empty_sink_returns_typed_empty(spark, tmp_path):
    """A consumer polling a sink that never delivered a message (the
    writer creates the dir on first delivery) gets an EMPTY typed
    frame, not PATH_NOT_FOUND."""
    from pypgoutput_spark.streaming import pipeline as P

    df = P.read_messages(spark, str(tmp_path / "never_created"))
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == [
        "segment", "lsn", "xid", "commit_ts_us",
        "transactional", "prefix", "content",
    ]


def test_missing_path_detection_across_spark_builds():
    """read_messages' missing-path probe must recognize every spelling:
    error class PATH_NOT_FOUND (Spark 4.x), message 'Path does not
    exist' (3.x / vendor builds) — and must NOT swallow other analysis
    errors."""
    from pypgoutput_spark.streaming.pipeline import _is_missing_path_exc

    class _Exc(Exception):
        def __init__(self, msg, cls=None, broken=False):
            super().__init__(msg)
            self._cls, self._broken = cls, broken

        def getErrorClass(self):
            if self._broken:
                raise RuntimeError("no class")
            return self._cls

    class _NoApi(Exception):
        pass

    assert _is_missing_path_exc(_Exc("[PATH_NOT_FOUND] Path does not"
                                     " exist: /x", cls="PATH_NOT_FOUND"))
    assert _is_missing_path_exc(_NoApi("Path does not exist: /x"))
    assert _is_missing_path_exc(_Exc("Path does not exist: /x", cls=None))
    assert _is_missing_path_exc(_Exc("Path does not exist: /x", broken=True))
    # a different structured class wins over a coincidental message
    assert not _is_missing_path_exc(
        _Exc("Path does not exist mentioned in passing",
             cls="UNABLE_TO_INFER_SCHEMA"))
    assert not _is_missing_path_exc(_NoApi("some other analysis error"))
