"""Replication-origin filtering (``skip_foreign_origins``): client-side
loop prevention for active-active replication meshes.

PostgreSQL sends an Origin message 'O' right after Begin (or inside a
stream's first chunk) for transactions whose rows were replicated FROM
another node. The reference stubs the message (reference
decoders.py:191-200, "Origin ... not yet implemented"); this engine
decodes the body (origin commit LSN + origin name) and, when
``skip_foreign_origins=True``, drops every event of a foreign-origin
transaction — the reason PG emits 'O' at all. Default False keeps the
reference-parity skip (events applied, 'O' ignored).

Covers: codec round-trip, both kernels (v1 spans and v2 streams),
kernel-choice pinning (no loop fallback), micro-batch cut carry
(``open_foreign`` rides the snapshot like ``open_tx``), the
transactional/non-transactional 'M' split, the Truncate loud refusal,
and the generated-stream end-to-end vs the filtered DuckDB oracle.
"""

from __future__ import annotations

import tempfile

import duckdb
import pandas as pd
import pytest

from pypgoutput_spark.lake.table import LakeTable
from pypgoutput_spark.operators import decode as decode_op
from pypgoutput_spark.streaming import pipeline as pipe
from pypgoutput_spark.wal import codec, generator as gen

RID = gen.RELATION_ID


def _cells(*vals):
    return [("t", v) if v is not None else ("n", None) for v in vals]


def _mk_frames_df(spark, rows):
    return spark.createDataFrame(
        [(seg, lsn, payload[0:1].decode(), bytearray(payload))
         for seg, lsn, payload in rows],
        schema="segment BIGINT, lsn BIGINT, mtype STRING, payload BINARY",
    )


def _rel():
    return codec.encode_relation(
        RID, gen.RELATION_NAMESPACE, gen.RELATION_NAME, "d",
        gen.RELATION_COLUMNS,
    )


# ---------------------------------------------------------------------------
# codec grammar
# ---------------------------------------------------------------------------


def test_codec_origin_round_trip():
    m = codec.decode_message(codec.encode_origin(987654, "node_b"))
    assert m == {
        "msg_type": "O", "origin_commit_lsn": 987654,
        "origin_name": "node_b",
    }
    # bare 1-byte 'O' (old synthetic streams / unknown emitters) tolerated
    assert codec.decode_message(b"O") == {"msg_type": "O"}


# ---------------------------------------------------------------------------
# v1 spans, both kernels
# ---------------------------------------------------------------------------


def _v1_rows():
    """One foreign txn (B, O, I, U, C), one local txn, one more foreign
    (delete) — all segment 0, LSN-ordered."""
    return [
        (0, 1, _rel()),
        # foreign txn: its rows came from node_b
        (0, 10, codec.encode_begin(10, 111000, 500)),
        (0, 11, codec.encode_origin(9000, "node_b")),
        (0, 12, codec.encode_insert(RID, _cells("rF", "pF", "c1", "py", "v1"))),
        (0, 13, codec.encode_update(RID, _cells("rF", "pF", "c2", "py", "v2"))),
        (0, 14, codec.encode_commit(13, 14, 111000)),
        # local txn: no Origin → applies
        (0, 20, codec.encode_begin(20, 222000, 501)),
        (0, 21, codec.encode_insert(RID, _cells("rL", "pL", "c3", "py", "v3"))),
        (0, 22, codec.encode_commit(21, 22, 222000)),
        # second foreign txn
        (0, 30, codec.encode_begin(30, 333000, 502)),
        (0, 31, codec.encode_origin(9100, "node_b")),
        (0, 32, codec.encode_delete(RID, _cells("rL", "pL", None, None, None))),
        (0, 33, codec.encode_commit(32, 33, 333000)),
    ]


@pytest.mark.parametrize("mode", ["loop", "strict-vec", "optimistic"])
def test_v1_foreign_txns_dropped(spark, mode):
    frames = _mk_frames_df(spark, _v1_rows())
    raw = decode_op.decode_frames_raw(
        frames,
        strict=(mode != "optimistic"),
        vectorized=(mode != "loop"),
        forbid_loop=(mode == "optimistic"),
        skip_foreign_origins=True,
    )
    rows = {r["lsn"]: r for r in raw.collect()}
    # only the local txn's event survives
    assert set(rows) == {21}
    assert rows[21]["op"] == "I" and rows[21]["xid"] == 501


@pytest.mark.parametrize("mode", ["loop", "strict-vec"])
def test_v1_default_keeps_reference_parity(spark, mode):
    """Default (skip_foreign_origins=False): 'O' is skipped, the foreign
    txns' events apply — exactly the reference's stub behavior."""
    frames = _mk_frames_df(spark, _v1_rows())
    raw = decode_op.decode_frames_raw(
        frames, strict=True, vectorized=(mode == "strict-vec")
    )
    assert {r["lsn"] for r in raw.collect()} == {12, 13, 21, 32}


# ---------------------------------------------------------------------------
# v2 streams: an in-chunk Origin marks the whole stream foreign
# ---------------------------------------------------------------------------


def _v2_rows():
    xF, xL = 7001, 7002
    return [
        (0, 1, _rel()),
        # foreign streamed txn: 'O' inside its first chunk
        (0, 10, codec.encode_stream_start(xF, True)),
        (0, 11, codec.add_stream_xid(codec.encode_origin(9000, "node_b"), xF)),
        (0, 12, codec.add_stream_xid(
            codec.encode_insert(RID, _cells("rF", "pF", "c1", "py", "v1")), xF)),
        (0, 13, codec.encode_stream_stop()),
        # local streamed txn
        (0, 20, codec.encode_stream_start(xL, True)),
        (0, 21, codec.add_stream_xid(
            codec.encode_insert(RID, _cells("rL", "pL", "c2", "py", "v2")), xL)),
        (0, 22, codec.encode_stream_stop()),
        (0, 30, codec.encode_stream_commit(xF, 29, 30, 111000)),
        (0, 31, codec.encode_stream_commit(xL, 30, 31, 222000)),
    ]


@pytest.mark.parametrize("mode", ["loop", "strict-vec", "optimistic"])
def test_v2_foreign_stream_dropped_at_seal(spark, mode):
    frames = _mk_frames_df(spark, _v2_rows())
    raw = decode_op.decode_frames_raw(
        frames,
        strict=(mode != "optimistic"),
        vectorized=(mode != "loop"),
        forbid_loop=(mode == "optimistic"),
        skip_foreign_origins=True,
    )
    rows = {r["lsn"]: r for r in raw.collect()}
    assert set(rows) == {21}
    assert rows[21]["xid"] == 7002 and rows[21]["commit_ts_us"] == 222000


def test_v2_default_keeps_foreign_stream(spark):
    frames = _mk_frames_df(spark, _v2_rows())
    raw = decode_op.decode_frames_raw(frames, strict=True)
    assert {r["lsn"] for r in raw.collect()} == {12, 21}


# ---------------------------------------------------------------------------
# micro-batch cuts: the foreign flag carries like open_tx
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("cut", [11, 12])  # after 'O' / after first DML
def test_foreign_span_carry_across_cut(spark, cut):
    """A span cut after its 'O' stays foreign in the next batch: the
    carry-out set feeds the next decode's ``open_foreign``."""
    from pypgoutput_spark.plans.registry import RelationRegistry

    rows = _v1_rows()
    head = [r for r in rows if r[1] <= cut]
    tail = [r for r in rows if r[1] > cut]
    registry = RelationRegistry.from_frames(_mk_frames_df(spark, rows))

    # batch 1: the foreign span's DML up to the cut is already dropped
    # (v1 events emit immediately; only streams buffer)
    got1 = decode_op.decode_frames_raw(
        _mk_frames_df(spark, head), registry, skip_foreign_origins=True
    ).collect()
    assert all(r["lsn"] != 12 for r in got1)

    # batch 2: without the carry the tail would mis-apply lsn 13 (U) —
    # with open_foreign={0} and the open_tx carry it stays dropped
    got2 = decode_op.decode_frames_raw(
        _mk_frames_df(spark, tail), registry,
        skip_foreign_origins=True,
        open_tx={0: (500, 10, 111000)},
        open_foreign={0},
    ).collect()
    lsns2 = {r["lsn"] for r in got2}
    assert 13 not in lsns2 and 12 not in lsns2
    assert 21 in lsns2  # the local txn still applies


def test_cut_between_begin_and_origin(spark):
    """split='lsn' worst case: the cut falls between B and O. The next
    batch's 'O' (no same-segment B/C before it) marks the CARRIED span
    foreign."""
    from pypgoutput_spark.plans.registry import RelationRegistry

    rows = _v1_rows()
    head = [r for r in rows if r[1] <= 10]  # just R + B
    tail = [r for r in rows if r[1] > 10]   # O, DML, C, ...
    registry = RelationRegistry.from_frames(_mk_frames_df(spark, rows))
    got1 = decode_op.decode_frames_raw(
        _mk_frames_df(spark, head), registry, skip_foreign_origins=True
    ).collect()
    assert got1 == []
    got2 = decode_op.decode_frames_raw(
        _mk_frames_df(spark, tail), registry,
        skip_foreign_origins=True,
        open_tx={0: (500, 10, 111000)},
        open_foreign=set(),
    ).collect()
    lsns = {r["lsn"] for r in got2}
    assert lsns == {21}


# ---------------------------------------------------------------------------
# messages and truncate inside a foreign span
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mode", ["loop", "strict-vec"])
def test_message_split_inside_foreign_span(spark, mode):
    """A transactional 'M' follows its foreign txn's skip; a
    NON-transactional 'M' (PG delivers it regardless of the txn's fate)
    still surfaces."""
    rows = [
        (0, 1, _rel()),
        (0, 10, codec.encode_begin(10, 111000, 500)),
        (0, 11, codec.encode_origin(9000, "node_b")),
        (0, 12, codec.encode_logical_message(True, 12, "audit", b"tx-scoped")),
        (0, 13, codec.encode_logical_message(False, 13, "heartbeat", b"always")),
        (0, 14, codec.encode_insert(RID, _cells("rF", "pF", "c1", "py", "v1"))),
        (0, 15, codec.encode_commit(14, 15, 111000)),
    ]
    raw = decode_op.decode_frames_raw(
        _mk_frames_df(spark, rows), strict=True,
        vectorized=(mode == "strict-vec"), skip_foreign_origins=True,
    )
    rows_out = {r["lsn"]: r for r in raw.collect()}
    assert set(rows_out) == {13}
    assert rows_out[13]["op"] == "M" and rows_out[13]["before_kind"] == "n"


@pytest.mark.parametrize("mode", ["loop", "strict-vec"])
def test_truncate_in_foreign_txn_refused(spark, mode):
    """The truncate barrier is planned from frame metadata, which carries
    no origin — a foreign-origin Truncate must fail loudly, not
    half-apply."""
    rows = [
        (0, 1, _rel()),
        (0, 10, codec.encode_begin(10, 111000, 500)),
        (0, 11, codec.encode_origin(9000, "node_b")),
        (0, 12, codec.encode_truncate([RID])),
        (0, 13, codec.encode_commit(12, 13, 111000)),
    ]
    with pytest.raises(Exception, match="foreign-origin"):
        decode_op.decode_frames_raw(
            _mk_frames_df(spark, rows), strict=True,
            vectorized=(mode == "strict-vec"), skip_foreign_origins=True,
        ).collect()


# ---------------------------------------------------------------------------
# generator layout + end-to-end vs the filtered DuckDB oracle
# ---------------------------------------------------------------------------


def test_generator_origin_layout(spark):
    p = gen.GenParams(
        n_txns=20, ops_per_txn=4, n_repos=8, n_paths=5,
        txns_per_segment=5, origin_pct=50,
    )
    pdf = gen.spark_frames_df(spark, p).toPandas()
    # Origin frames exist, typed 'O', each right after its Begin
    o = pdf[pdf.mtype == "O"]
    assert len(o) > 0
    b_lsns = set(pdf[pdf.mtype == "B"].lsn)
    assert all((lsn - 1) in b_lsns for lsn in o.lsn)
    # body decodes with the configured origin name
    m = codec.decode_message(bytes(o.iloc[0].payload))
    assert m["origin_name"] == p.origin_name
    # composition guards: serial streams compose; interleave/2pc do not
    with pytest.raises(ValueError, match="serial"):
        gen.GenParams(origin_pct=10, two_phase_pct=10)
    with pytest.raises(ValueError, match="serial"):
        gen.GenParams(origin_pct=10, stream_pct=10,
                      interleave_streams=True, txns_per_segment=4)


def test_generator_origin_stream_composed_layout(spark):
    """origin_pct × stream_pct: a foreign STREAMED txn's 'O' rides its
    first chunk — xid-prefixed, mtype-stamped lowercase 'o' (metadata
    paths must not read v2 payloads with v1 offsets); receiver slot
    frames stay byte-identical."""
    from pypgoutput_spark.sources import receiver as rcv

    p = gen.GenParams(
        n_txns=30, ops_per_txn=4, n_repos=10, n_paths=6,
        txns_per_segment=6, origin_pct=50, stream_pct=40,
        stream_abort_pct=25,
    )
    pdf = gen.spark_frames_df(spark, p).toPandas().sort_values("lsn")
    o_top = pdf[pdf.mtype == "O"]
    o_chunk = pdf[pdf.mtype == "o"]
    assert len(o_top) > 0 and len(o_chunk) > 0
    # in-chunk 'O': byte1 'O', then the stream xid, then the v1 body
    raw = bytes(o_chunk.iloc[0].payload)
    xid, body = codec.strip_stream_xid(raw)
    m = codec.decode_message(body)
    assert m["msg_type"] == "O" and m["origin_name"] == p.origin_name
    # each in-chunk 'o' sits right after its stream's first 'S'
    s_lsns = set(pdf[pdf.mtype == "S"].lsn)
    assert all((lsn - 1) in s_lsns for lsn in o_chunk.lsn)
    # receiver producer emits byte-identical frames for the composed layout
    rpdf = rcv.encode_frames_pdf(p, include_relation=True) \
        .sort_values("lsn").reset_index(drop=True)
    gpdf = pdf.reset_index(drop=True)
    assert len(rpdf) == len(gpdf)
    assert (rpdf.mtype.values == gpdf.mtype.values).all()
    assert all(bytes(a) == bytes(b) for a, b in zip(rpdf.payload, gpdf.payload))


def test_generated_origin_stream_matches_filtered_oracle(spark):
    p = gen.GenParams(
        n_txns=60, ops_per_txn=6, n_repos=20, n_paths=12,
        txns_per_segment=10, toast_pct=25, origin_pct=40,
    )
    frames = gen.spark_frames_df(spark, p)
    tmp = tempfile.mkdtemp(prefix="porigin_")
    table = LakeTable.create(
        spark, f"{tmp}/lake",
        schema=[(c, "string") for c in gen.ALL_COLUMNS],
        key_cols=list(gen.KEY_COLUMNS), n_buckets=8,
    )
    ms = pipe.run_ingest(
        spark, frames, table, n_batches=4, skip_foreign_origins=True
    )
    # the open_foreign carry is part of every batch's metrics
    assert all("open_foreign" in m for m in ms)
    got = (
        table.read().toPandas()
        .sort_values(["repo", "path"]).reset_index(drop=True)
    )
    exp = (
        duckdb.sql(gen.duckdb_final_state_sql(
            p, with_sha=False, filter_foreign_origins=True
        )).df()
        .sort_values(["repo", "path"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["repo", "path", "commit", "lang", "content"]],
        exp[["repo", "path", "commit", "lang", "content"]],
        check_dtype=False,
    )
    # fewer rows than the unfiltered replay would produce (foreign txns
    # really were dropped, not merely re-labelled)
    exp_all = duckdb.sql(gen.duckdb_final_state_sql(p, with_sha=False)).df()
    assert len(exp) < len(exp_all)
    # snapshot carry round-trips through storage
    assert pipe.stored_open_foreign(table) == set(
        ms[-1].get("open_foreign", [])
    )


def test_generated_composed_origin_stream_matches_oracle(spark):
    """origin_pct × stream_pct e2e: BOTH filter paths in one replay —
    v1 spans (cut-carried per-segment flag) and v2 streams (in-chunk
    'O', dropped at seal) — against the oracle with foreign AND aborted
    transactions excluded."""
    p = gen.GenParams(
        n_txns=60, ops_per_txn=6, n_repos=20, n_paths=12,
        txns_per_segment=10, toast_pct=25,
        origin_pct=40, stream_pct=35, stream_abort_pct=20,
    )
    frames = gen.spark_frames_df(spark, p)
    tmp = tempfile.mkdtemp(prefix="porigin_comp_")
    table = LakeTable.create(
        spark, f"{tmp}/lake",
        schema=[(c, "string") for c in gen.ALL_COLUMNS],
        key_cols=list(gen.KEY_COLUMNS), n_buckets=8,
    )
    pipe.run_ingest(
        spark, frames, table, n_batches=4, skip_foreign_origins=True
    )
    got = (
        table.read().toPandas()
        .sort_values(["repo", "path"]).reset_index(drop=True)
    )
    exp = (
        duckdb.sql(gen.duckdb_final_state_sql(
            p, with_sha=False, filter_foreign_origins=True
        )).df()
        .sort_values(["repo", "path"]).reset_index(drop=True)
    )
    cols = ["repo", "path", "commit", "lang", "content"]
    pd.testing.assert_frame_equal(got[cols], exp[cols], check_dtype=False)
    # the default (parity) replay still matches the UNfiltered oracle
    table2 = LakeTable.create(
        spark, f"{tmp}/lake2",
        schema=[(c, "string") for c in gen.ALL_COLUMNS],
        key_cols=list(gen.KEY_COLUMNS), n_buckets=8,
    )
    pipe.run_ingest(spark, frames, table2, n_batches=4)
    got2 = (
        table2.read().toPandas()
        .sort_values(["repo", "path"]).reset_index(drop=True)
    )
    exp2 = (
        duckdb.sql(gen.duckdb_final_state_sql(p, with_sha=False)).df()
        .sort_values(["repo", "path"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got2[cols], exp2[cols], check_dtype=False)
    assert len(exp) < len(exp2)


def test_mid_span_lsn_cut_carries_foreign_flag_e2e(spark):
    """split='lsn' cuts fall anywhere — including inside foreign spans;
    the persisted open_foreign carry keeps the replay ≡ oracle."""
    p = gen.GenParams(
        n_txns=40, ops_per_txn=6, n_repos=15, n_paths=10,
        txns_per_segment=8, origin_pct=45,
    )
    frames = gen.spark_frames_df(spark, p)
    tmp = tempfile.mkdtemp(prefix="porigin_lsn_")
    table = LakeTable.create(
        spark, f"{tmp}/lake",
        schema=[(c, "string") for c in gen.ALL_COLUMNS],
        key_cols=list(gen.KEY_COLUMNS), n_buckets=8,
    )
    pipe.run_ingest(
        spark, frames, table, n_batches=7, split="lsn",
        skip_foreign_origins=True,
    )
    got = (
        table.read().toPandas()
        .sort_values(["repo", "path"]).reset_index(drop=True)
    )
    exp = (
        duckdb.sql(gen.duckdb_final_state_sql(
            p, with_sha=False, filter_foreign_origins=True
        )).df()
        .sort_values(["repo", "path"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["repo", "path", "commit", "lang", "content"]],
        exp[["repo", "path", "commit", "lang", "content"]],
        check_dtype=False,
    )
