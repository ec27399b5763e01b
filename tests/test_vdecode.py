"""Vectorized (Arrow/numpy) decode kernel ≡ loop kernel equivalence.

The mapInArrow kernel (wal.vdecode) must reproduce the per-message loop
kernel (operators.decode._make_kernel) bit-for-bit on every grammar path:
I/U/D with n/u/t cells, K/O old images, truncate fan-out, transaction
stamping with and without carried-in state, multi-relation dispatch.
"""

from __future__ import annotations

import pandas as pd
import pytest

from pypgoutput_spark.operators import decode as decode_op
from pypgoutput_spark.plans.registry import RelationRegistry
from pypgoutput_spark.wal import codec
from pypgoutput_spark.wal import generator as gen


def _decode_both(spark, frames, registry=None, open_tx=None):
    cols = ["lsn", "op", "relation_id", "xid", "begin_lsn", "commit_ts_us",
            "schema_version", "before_kind", "before_vals",
            "new_vals", "new_u_masks", "segment"]
    reg = registry or RelationRegistry.from_frames(frames)
    vec = (
        decode_op.decode_frames_raw(frames, reg, open_tx=open_tx, vectorized=True)
        .toPandas().sort_values("lsn").reset_index(drop=True)[cols]
    )
    loop = (
        decode_op.decode_frames_raw(frames, reg, open_tx=open_tx, vectorized=False)
        .toPandas().sort_values("lsn").reset_index(drop=True)[cols]
    )
    return vec, loop


def _assert_same(vec: pd.DataFrame, loop: pd.DataFrame):
    assert len(vec) == len(loop) and len(vec) > 0

    def norm(x):
        if x is None:
            return None
        if isinstance(x, float) and x != x:  # NaN (nullable numeric)
            return None
        if not isinstance(x, str) and hasattr(x, "__len__"):
            return list(x)
        return x

    for c in vec.columns:
        a, b = vec[c].tolist(), loop[c].tolist()
        assert [norm(x) for x in a] == [norm(x) for x in b], f"column {c} differs"


def test_vectorized_equals_loop_generated_stream(spark):
    p = gen.GenParams(n_txns=60, ops_per_txn=6, toast_pct=30,
                      truncate_every=15, txns_per_segment=10, n_relations=2,
                      key_change_pct=20)
    frames = gen.spark_frames_df(spark, p)
    vec, loop = _decode_both(spark, frames)
    _assert_same(vec, loop)
    # sanity: the stream exercised T fan-out, both relations, and
    # U-with-old-image (key-change) frames
    assert (vec["op"] == "T").any()
    assert vec["relation_id"].nunique() == 2
    assert (vec["before_kind"] == "K").sum() > 0


def test_vectorized_equals_loop_edge_grammar(spark):
    """Hand-built frames: K/O old images, empty strings vs NULLs vs
    TOAST-'u', carried-in open transaction."""
    RID = gen.RELATION_ID
    reg = RelationRegistry()
    reg.add_relation(1, codec.decode_message(codec.encode_relation(
        RID, "public", "repo_files", "d", gen.RELATION_COLUMNS)))

    def c5(*vals):
        return [("t", v) if v is not None else ("n", None) for v in vals]

    rows = [
        (0, 1, "R", codec.encode_relation(RID, "public", "repo_files", "d",
                                          gen.RELATION_COLUMNS)),
        (0, 10, "B", codec.encode_begin(10, 5_000_000, 42)),
        (0, 11, "I", codec.encode_insert(RID, c5("r1", "p1", "c1", "py", ""))),
        (0, 12, "U", codec.encode_update(
            RID, [("t", "r1"), ("t", "p1"), ("t", "c2"), ("n", None), ("u", None)])),
        (0, 13, "U", codec.encode_update(
            RID, c5("r1", "p1", "c3", "java", "body"),
            old_cells=c5("r1", "p1", None, None, None), old_kind="K")),
        (0, 14, "U", codec.encode_update(
            RID, c5("r1", "p1", "c4", None, "x"),
            old_cells=c5("r1", "p1", "c3", "java", "body"), old_kind="O")),
        (0, 15, "D", codec.encode_delete(
            RID, c5("r1", "p1", None, None, None), kind="O")),
        (0, 16, "T", codec.encode_truncate([RID], 1)),
        (0, 17, "C", codec.encode_commit(16, 17, 5_000_000)),
        (1, 20, "I", codec.encode_insert(RID, c5("r2", "p2", "c5", None, "zz"))),
    ]
    frames = spark.createDataFrame(
        [(s, l, m, bytearray(pl)) for s, l, m, pl in rows],
        schema=gen.FRAMES_SCHEMA,
    )
    carry = {1: (99, 18, 7_000_000)}
    vec, loop = _decode_both(spark, frames, reg, open_tx=carry)
    _assert_same(vec, loop)
    # the carried transaction stamped segment 1's event in both kernels
    seg1 = vec[vec["segment"] == 1].iloc[0]
    assert seg1["xid"] == 99 and seg1["begin_lsn"] == 18


def test_vectorized_strict_errors(spark):
    """Grammar violations raise (strict contract parity with the loop
    kernel and the reference's fail-fast, decoders.py:325-378)."""
    RID = gen.RELATION_ID
    reg = RelationRegistry()
    reg.add_relation(1, codec.decode_message(codec.encode_relation(
        RID, "public", "repo_files", "d", gen.RELATION_COLUMNS)))
    bad_delete = b"D" + RID.to_bytes(4, "big") + b"X" + b"\x00\x00"
    frames = spark.createDataFrame(
        [(0, 5, "D", bytearray(bad_delete))], schema=gen.FRAMES_SCHEMA
    )
    with pytest.raises(Exception, match="'K' or 'O'"):
        decode_op.decode_frames_raw(frames, reg, vectorized=True).collect()


def test_empty_payload_dead_letters_not_partition_crash(spark):
    """An EMPTY payload (torn capture) must quarantine as one op='E' row
    in strict=False, not kill the partition: round-5 review found the
    pre-scan read data[starts] off the end of the buffer (trailing empty
    row) or the NEXT row's first byte (mid-batch) before any try/except.
    Both positions now classify as corrupt DML and dead-letter through
    the loop fallback while every other row decodes."""
    RID = gen.RELATION_ID
    reg = RelationRegistry()
    reg.add_relation(1, codec.decode_message(codec.encode_relation(
        RID, "public", "repo_files", "d", gen.RELATION_COLUMNS)))
    ins = codec.encode_insert(
        RID, [("t", "r"), ("t", "p"), ("t", "c"), ("t", "py"), ("t", "v")]
    )
    for pos in ("mid", "trailing"):
        # the kernel sorts by (segment, lsn), so a genuinely MID-batch
        # empty row needs a mid-range lsn (11) — a max-lsn empty row
        # would sort to the end and only test the trailing case
        if pos == "mid":
            rows = [
                (0, 10, "B", bytearray(codec.encode_begin(10, 111000, 42))),
                (0, 11, "?", bytearray(b"")),
                (0, 12, "I", bytearray(ins)),
                (0, 13, "C", bytearray(codec.encode_commit(12, 13, 111000))),
            ]
            ins_lsn, empty_lsn = 12, 11
        else:
            rows = [
                (0, 10, "B", bytearray(codec.encode_begin(10, 111000, 42))),
                (0, 11, "I", bytearray(ins)),
                (0, 12, "C", bytearray(codec.encode_commit(11, 12, 111000))),
                (0, 13, "?", bytearray(b"")),
            ]
            ins_lsn, empty_lsn = 11, 13
        frames = spark.createDataFrame(rows, schema=gen.FRAMES_SCHEMA)
        got = {r["lsn"]: r for r in decode_op.decode_frames_raw(
            frames.coalesce(1), reg, strict=False, clustered=True
        ).collect()}
        assert got[ins_lsn]["op"] == "I" and got[ins_lsn]["xid"] == 42, pos
        assert got[empty_lsn]["op"] == "E" and got[empty_lsn]["error"], pos
        assert set(got) == {ins_lsn, empty_lsn}, pos
        # strict mode: a CLEAR error, not a misattributed type byte
        with pytest.raises(Exception, match="empty payload at lsn"):
            decode_op.decode_frames_raw(
                frames.coalesce(1), reg, strict=True, vectorized=True,
                clustered=True,
            ).collect()


def test_combine_widens_past_int32_binary_offsets():
    """A stream group whose payload bytes exceed 2 GiB cannot live in one
    int32-offset binary chunk: combine_chunks() keeps 2+ chunks and
    to_batches()[0] used to SILENTLY return only the first — dropping
    the tail rows (typically the Stream Commit). _combine now widens the
    payload to large_binary (int64 offsets); every row survives and
    _payload_arrays reads the widened offsets correctly."""
    import pyarrow as pa

    from pypgoutput_spark.wal import vdecode

    blob = b"x" * (300 << 20)  # 300 MiB
    group = []
    for b in range(4):
        payloads = [bytes([65 + 2 * b]) + blob, bytes([66 + 2 * b]) + blob]
        group.append(pa.RecordBatch.from_arrays(
            [pa.array([2 * b, 2 * b + 1], type=pa.int64()),
             pa.array([100 + 2 * b, 101 + 2 * b], type=pa.int64()),
             pa.array(payloads, type=pa.binary())],
            names=["segment", "lsn", "payload"],
        ))
    combined = vdecode._combine(group)   # 8 rows × ~300 MiB = 2.34 GiB
    assert combined.num_rows == 8
    assert pa.types.is_large_binary(combined.schema.field("payload").type)
    data, offs, seg, lsn = vdecode._payload_arrays(combined)
    assert offs[-1] == 8 * (len(blob) + 1)
    # every row's first byte intact, in order — nothing dropped
    assert data[offs[:-1]].tolist() == [65, 66, 67, 68, 69, 70, 71, 72]
    assert lsn.tolist() == [100, 101, 102, 103, 104, 105, 106, 107]
