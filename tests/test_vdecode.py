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
