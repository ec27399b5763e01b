"""Bounded-memory (spill-to-disk) decode of oversized streamed
transactions ≡ the in-memory vectorized resolver, bit for bit.

The spill path (wal.vspill) exists for the 100 TB deployment shape: PG
streams a transaction precisely because it is large, so the decode-side
buffering bound must not be O(transaction bytes). These tests force the
spill with a 1-byte threshold so EVERY stream group takes the spool-file
+ fate-map path, and pin output equality against the default in-memory
grouping on every grammar feature: interleaved streams, whole-stream
and subtransaction aborts, Stream Prepare 'p', v1 transactions between
chunks, foreign-origin filtering, and the generator's composed WAL.
"""

from __future__ import annotations

import glob
import os

import pandas as pd
import pyarrow as pa
import pytest

from pypgoutput_spark.operators import decode as decode_op
from pypgoutput_spark.plans.registry import RelationRegistry
from pypgoutput_spark.sources.receiver import logical_slots_pdf
from pypgoutput_spark.wal import codec, vdecode, vspill
from pypgoutput_spark.wal import generator as gen
from pypgoutput_spark.wal.generator import (
    RELATION_COLUMNS,
    RELATION_ID,
    RELATION_NAME,
    RELATION_NAMESPACE,
    GenParams,
    _encode_stream_pandas,
)


def _plain() -> dict:
    reg = RelationRegistry()
    reg.add_relation(1, codec.decode_message(codec.encode_relation(
        RELATION_ID, RELATION_NAMESPACE, RELATION_NAME, "d",
        RELATION_COLUMNS,
    )))
    return reg.to_plain()


def _frames_batch(p: GenParams) -> pa.RecordBatch:
    slots = logical_slots_pdf(p)
    out = pd.concat(list(_encode_stream_pandas(iter([slots]), p)))
    return pa.RecordBatch.from_pandas(
        out[["segment", "lsn", "mtype", "payload"]], preserve_index=False
    )


def _slices(rb: pa.RecordBatch, size: int):
    return [rb.slice(i, min(size, rb.num_rows - i))
            for i in range(0, rb.num_rows, size)]


def _decode(batches, plain, spill=None, **kw) -> pd.DataFrame:
    kernel = vdecode.make_kernel(plain, stream_spill_bytes=spill, **kw)
    outs = list(kernel(iter(batches)))
    if not outs:
        return pd.DataFrame()
    df = pa.Table.from_batches(outs).to_pandas()
    return df.sort_values("lsn").reset_index(drop=True)


def _assert_equal(a: pd.DataFrame, b: pd.DataFrame):
    assert len(a) == len(b) and len(a) > 0

    def norm(x):
        if x is None or (isinstance(x, float) and x != x):
            return None
        if not isinstance(x, str) and hasattr(x, "__len__"):
            return list(x)
        return x

    for c in a.columns:
        assert [norm(x) for x in a[c]] == [norm(x) for x in b[c]], \
            f"column {c} differs"


def _rows_to_batch(rows):
    return pa.RecordBatch.from_pandas(pd.DataFrame({
        "segment": pd.array([r[0] for r in rows], dtype="int64"),
        "lsn": pd.array([r[1] for r in rows], dtype="int64"),
        "mtype": [chr(r[2][0]) for r in rows],
        "payload": [bytes(r[2]) for r in rows],
    }), preserve_index=False)


def _cells(*vals):
    return [("t", v) if v is not None else ("n", None) for v in vals]


@pytest.mark.parametrize("batch_rows", [7, 64])
def test_spill_equals_inmemory_generated_interleaved(batch_rows):
    """Generator WAL with interleaved stream chunks + aborts: forced
    spill output ≡ in-memory output on every column."""
    p = GenParams(n_txns=40, ops_per_txn=6, toast_pct=25,
                  txns_per_segment=10, stream_pct=50, stream_abort_pct=30,
                  interleave_streams=True)
    rb = _frames_batch(p)
    plain = _plain()
    base = _decode([rb], plain, spill=None)
    spilled = _decode(_slices(rb, batch_rows), plain, spill=1)
    _assert_equal(base, spilled)


def test_spill_equals_inmemory_streamed_two_phase():
    """Composed WAL: 100% streamed, 30% sealed with Stream Prepare 'p'
    (decisions in-stream) — the 'p' marker rows and prepare-stamped
    events survive the spill path identically."""
    p = GenParams(n_txns=30, ops_per_txn=6, toast_pct=25,
                  txns_per_segment=10, stream_pct=100, stream_abort_pct=10,
                  two_phase_pct=30, two_phase_rollback_pct=20,
                  two_phase_gap=4)
    rb = _frames_batch(p)
    plain = _plain()
    base = _decode([rb], plain, spill=None)
    spilled = _decode(_slices(rb, 16), plain, spill=1)
    _assert_equal(base, spilled)


def test_spill_subxid_abort_and_v1_between_chunks():
    """Hand-built grammar: interleaved streams, a savepoint (subxid)
    abort, and a plain v1 transaction BETWEEN chunks — the spilled
    resolver must stamp the v1 span from the B/C scan and the in-chunk
    rows from the fate map, dropping exactly the aborted subxid's."""
    rel = codec.encode_relation(
        RELATION_ID, RELATION_NAMESPACE, RELATION_NAME, "d", RELATION_COLUMNS
    )
    x1, x2, sub = 8001, 8002, 8100
    rows = [
        (0, 1, rel),
        (0, 10, codec.encode_stream_start(x1, True)),
        (0, 11, codec.add_stream_xid(
            codec.encode_insert(RELATION_ID, _cells("a", "p1", "c1", "py", "v1")), x1)),
        (0, 12, codec.add_stream_xid(
            codec.encode_insert(RELATION_ID, _cells("s", "p2", "c2", "py", "v2")), sub)),
        (0, 13, codec.encode_stream_stop()),
        (0, 20, codec.encode_stream_start(x2, True)),
        (0, 21, codec.add_stream_xid(
            codec.encode_insert(RELATION_ID, _cells("b", "p3", "c3", "py", "v3")), x2)),
        (0, 22, codec.encode_stream_stop()),
        # v1 transaction between chunks
        (0, 30, codec.encode_begin(30, 111000, 600)),
        (0, 31, codec.encode_insert(RELATION_ID, _cells("v", "p4", "c4", "py", "v4"))),
        (0, 32, codec.encode_commit(31, 32, 111000)),
        # savepoint rollback: only subxid 8100's event (lsn 12) vanishes
        (0, 40, codec.encode_stream_abort(x1, subxid=sub)),
        (0, 41, codec.encode_stream_start(x1, False)),
        (0, 42, codec.add_stream_xid(
            codec.encode_update(RELATION_ID, _cells("a", "p1", "c5", "py", "v5")), x1)),
        (0, 43, codec.encode_stream_stop()),
        (0, 50, codec.encode_stream_commit(x2, 49, 50, 222000)),
        (0, 51, codec.encode_stream_commit(x1, 50, 51, 333000)),
    ]
    rb = _rows_to_batch(rows)
    plain = _plain()
    base = _decode([rb], plain, spill=None)
    spilled = _decode(_slices(rb, 2), plain, spill=1)
    _assert_equal(base, spilled)
    got = {int(r) for r in spilled["lsn"]}
    assert got == {11, 21, 31, 42}  # lsn 12 discarded with the subxid
    by_lsn = spilled.set_index("lsn")
    assert by_lsn.loc[11, "xid"] == x1
    assert by_lsn.loc[11, "begin_lsn"] == 10
    assert by_lsn.loc[11, "commit_ts_us"] == 333000
    assert by_lsn.loc[21, "xid"] == x2
    assert by_lsn.loc[31, "xid"] == 600  # v1 span untouched


def test_spill_foreign_origin_filtering():
    """A streamed transaction whose chunk carries an Origin message
    drops its events under skip_foreign_origins on the spill path too."""
    rel = codec.encode_relation(
        RELATION_ID, RELATION_NAMESPACE, RELATION_NAME, "d", RELATION_COLUMNS
    )
    xf, xl = 7001, 7002
    rows = [
        (0, 1, rel),
        (0, 10, codec.encode_stream_start(xf, True)),
        (0, 11, codec.add_stream_xid(codec.encode_origin(5, "node_b"), xf)),
        (0, 12, codec.add_stream_xid(
            codec.encode_insert(RELATION_ID, _cells("f", "p1", "c1", "py", "v1")), xf)),
        (0, 13, codec.encode_stream_stop()),
        (0, 20, codec.encode_stream_start(xl, True)),
        (0, 21, codec.add_stream_xid(
            codec.encode_insert(RELATION_ID, _cells("l", "p2", "c2", "py", "v2")), xl)),
        (0, 22, codec.encode_stream_stop()),
        (0, 30, codec.encode_stream_commit(xf, 29, 30, 111000)),
        (0, 31, codec.encode_stream_commit(xl, 30, 31, 222000)),
    ]
    rb = _rows_to_batch(rows)
    plain = _plain()
    for skip, want in ((True, {21}), (False, {12, 21})):
        base = _decode([rb], plain, spill=None, skip_foreign_origins=skip)
        spilled = _decode(_slices(rb, 2), plain, spill=1,
                          skip_foreign_origins=skip)
        _assert_equal(base, spilled)
        assert {int(r) for r in spilled["lsn"]} == want


def test_spill_grouper_engages_and_cleans_up(tmp_path):
    """The grouper yields a SpilledGroup for an overflowing group, small
    groups stay in memory, and the spool file is deleted after decode."""
    p = GenParams(n_txns=20, ops_per_txn=5, toast_pct=0,
                  txns_per_segment=10, stream_pct=100, stream_abort_pct=0)
    rb = _frames_batch(p)
    groups = list(vspill.group_stream_batches_spill(
        iter(_slices(rb, 3)), 1, spill_dir=str(tmp_path)
    ))
    spilled = [g for g in groups if isinstance(g, vspill.SpilledGroup)]
    assert spilled, "1-byte threshold must force at least one spill"
    for g in spilled:
        assert os.path.exists(g.path)
        assert g.fates.seal or g.fates.full_abort
        list(vspill.decode_spilled_group(g, {}, _plain()))
        assert not os.path.exists(g.path)  # spool reclaimed
    # a huge threshold never spills: behavior identical to the default
    groups = list(vspill.group_stream_batches_spill(
        iter(_slices(rb, 3)), 1 << 40, spill_dir=str(tmp_path)
    ))
    assert not any(isinstance(g, vspill.SpilledGroup) for g in groups)
    assert not glob.glob(str(tmp_path / "pgoutput_stream_spill_*"))


def test_spill_dir_defaults_to_spark_local_dirs(tmp_path, monkeypatch):
    """With no explicit spill_dir the spool lands in the first of
    SPARK_LOCAL_DIRS — the executor scratch disks shuffle spills use
    (PySpark's ExternalMerger resolves its spill dirs from the same
    variable) — not the system temp dir: on hosts where /tmp is
    RAM-backed tmpfs, spooling there would re-create exactly the memory
    pressure the spill exists to avoid."""
    local = tmp_path / "scratch0"
    local.mkdir()
    monkeypatch.setenv("SPARK_LOCAL_DIRS", f"{local},{tmp_path / 'nope'}")
    assert vspill._default_spill_dir() == str(local)
    p = GenParams(n_txns=20, ops_per_txn=5, toast_pct=0,
                  txns_per_segment=10, stream_pct=100, stream_abort_pct=0)
    rb = _frames_batch(p)
    spooled = 0
    for g in vspill.group_stream_batches_spill(iter(_slices(rb, 3)), 1):
        if isinstance(g, vspill.SpilledGroup):
            spooled += 1
            assert os.path.dirname(g.path) == str(local)
            list(vspill.decode_spilled_group(g, {}, _plain()))
    assert spooled, "1-byte threshold must force at least one spill"
    # unset (plain pytest, driver-local decode) → system temp default
    monkeypatch.delenv("SPARK_LOCAL_DIRS")
    assert vspill._default_spill_dir() is None


def test_spill_validation_parity():
    """Grammar violations fail identically under the spill path: open
    stream at partition end, unknown Stream Commit, in-chunk Truncate
    (loud UnsupportedStreamOp, never quarantinable)."""
    rel = codec.encode_relation(
        RELATION_ID, RELATION_NAMESPACE, RELATION_NAME, "d", RELATION_COLUMNS
    )
    plain = _plain()
    open_rows = [
        (0, 1, rel),
        (0, 10, codec.encode_stream_start(5001, True)),
        (0, 11, codec.add_stream_xid(
            codec.encode_insert(RELATION_ID, _cells("a", "p", "c", "py", "v")), 5001)),
        (0, 12, codec.encode_stream_stop()),
    ]
    with pytest.raises(ValueError, match="still open at partition end"):
        _decode(_slices(_rows_to_batch(open_rows), 2), plain, spill=1)
    unknown_commit = open_rows + [
        (0, 20, codec.encode_stream_commit(9999, 19, 20, 111000)),
        (0, 21, codec.encode_stream_commit(5001, 20, 21, 222000)),
    ]
    with pytest.raises(ValueError, match="unknown xid"):
        _decode(_slices(_rows_to_batch(unknown_commit), 2), plain, spill=1)
    trunc_rows = [
        (0, 1, rel),
        (0, 10, codec.encode_stream_start(5001, True)),
        (0, 11, codec.add_stream_xid(codec.encode_truncate([RELATION_ID], 1), 5001)),
        (0, 12, codec.encode_stream_stop()),
        (0, 20, codec.encode_stream_commit(5001, 19, 20, 111000)),
    ]
    with pytest.raises(codec.UnsupportedStreamOp):
        _decode(_slices(_rows_to_batch(trunc_rows), 2), plain, spill=1)


def test_spark_decode_with_spill_matches_default(spark):
    """End-to-end through Spark mapInArrow: decode_frames_raw with a
    forced 1-byte spill threshold ≡ the default vectorized decode on a
    generator stream with interleaved chunks and aborts."""
    p = GenParams(n_txns=30, ops_per_txn=5, toast_pct=25,
                  txns_per_segment=10, stream_pct=50, stream_abort_pct=25,
                  interleave_streams=True)
    frames = gen.spark_frames_df(spark, p)
    cols = ["lsn", "op", "relation_id", "xid", "begin_lsn", "commit_ts_us",
            "schema_version", "before_kind", "before_vals",
            "new_vals", "new_u_masks", "segment"]
    base = (
        decode_op.decode_frames_raw(frames, vectorized=True)
        .toPandas().sort_values("lsn").reset_index(drop=True)[cols]
    )
    spilled = (
        decode_op.decode_frames_raw(frames, vectorized=True,
                                    stream_spill_bytes=1)
        .toPandas().sort_values("lsn").reset_index(drop=True)[cols]
    )
    _assert_equal(base, spilled)


def test_optimistic_spill_equals_default_and_keeps_quarantine():
    """strict=False (the streaming-pipeline kernel): forced spill ≡
    default on an interleaved streamed WAL, and an under-threshold
    corrupt v1 frame STILL dead-letters (op='E') — quarantine isolation
    is only traded away for groups that actually overflow."""
    p = GenParams(n_txns=30, ops_per_txn=5, toast_pct=25,
                  txns_per_segment=10, stream_pct=50, stream_abort_pct=25,
                  interleave_streams=True)
    rb = _frames_batch(p)
    plain = _plain()

    def run(batches, spill):
        kernel = decode_op._make_optimistic_kernel(
            plain, stream_spill_bytes=spill
        )
        outs = list(kernel(iter(batches)))
        df = pa.Table.from_batches(outs).to_pandas()
        return df.sort_values("lsn").reset_index(drop=True)

    base = run([rb], None)
    spilled = run(_slices(rb, 8), 1)
    _assert_equal(base, spilled)

    # corrupt v1 insert AFTER every stream closed (own batch, new
    # segment): passes through the spill grouper in memory, optimistic
    # decode fails, loop fallback dead-letters exactly that row
    max_seg = int(pa.compute.max(rb.column("segment")).as_py())
    bad = _rows_to_batch([(max_seg + 1, 10_000_000, b"I\x00\x00\xc8\x22Nxx")])
    out = run(_slices(rb, 8) + [bad], 1)
    dead = out[out["op"] == "E"]
    assert len(dead) == 1 and int(dead["lsn"].iloc[0]) == 10_000_000
    _assert_equal(base, out[out["op"] != "E"].reset_index(drop=True))


@pytest.mark.parametrize("strict", [True, False])
def test_run_ingest_with_spill_matches_oracle(spark, tmp_path, strict):
    """End-to-end: the full decode → LWW → MOR-merge pipeline with a
    forced 1-byte spill threshold lands the same final table state as
    the serial DuckDB oracle, on both decode modes."""
    import duckdb
    import pandas as pd

    from pypgoutput_spark.lake.table import LakeTable
    from pypgoutput_spark.streaming import pipeline

    p = GenParams(n_txns=60, ops_per_txn=6, n_repos=30, n_paths=20,
                  toast_pct=25, txns_per_segment=10, stream_pct=60,
                  stream_abort_pct=20, interleave_streams=True)
    frames = gen.spark_frames_df(spark, p)
    table = LakeTable.create(
        spark, str(tmp_path / "lake"),
        schema=[(c, "string") for c in gen.ALL_COLUMNS],
        key_cols=list(gen.KEY_COLUMNS), n_buckets=8,
    )
    pipeline.run_ingest(spark, frames, table, n_batches=3, strict=strict,
                        stream_spill_bytes=1)
    got = (table.read().toPandas()
           .sort_values(["repo", "path"]).reset_index(drop=True))
    want = (duckdb.sql(gen.duckdb_final_state_sql(p, with_sha=False)).df()
            .sort_values(["repo", "path"]).reset_index(drop=True))
    assert len(want) > 0 and len(got) == len(want)
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=False
    )
