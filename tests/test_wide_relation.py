"""Relations wider than 64 columns (multi-word TOAST u-masks).

PostgreSQL permits up to 1600 columns; the RAW contract carries the
TOAST-'u' bits as ARRAY<BIGINT> mask words, so width is unbounded in
both kernels. This pins a 100-column relation end-to-end:
encode → decode (loop AND vectorized) → positional projection →
LWW → merge → read-back, with 'u' cells on both sides of the word
boundary (columns 5 and 70)."""

from __future__ import annotations

import pandas as pd
import pytest

from pypgoutput_spark.lake.table import LakeTable
from pypgoutput_spark.operators import decode as decode_op
from pypgoutput_spark.plans.registry import RelationRegistry
from pypgoutput_spark.streaming import pipeline
from pypgoutput_spark.wal import codec

RID = 4242
N_COLS = 100
COLS = [("k0", 1), ("k1", 1)] + [(f"c{i}", 0) for i in range(N_COLS - 2)]
REL_COLUMNS = tuple((pk, name, 25, -1) for name, pk in COLS)
KEYS = ["k0", "k1"]
VALUE_COLS = [n for n, pk in COLS if not pk]
U_COLS = {"c3", "c68"}  # cell indexes 5 and 70 → words 0 and 1


def _cells(key, fill, u_cols=()):
    out = [("t", key[0]), ("t", key[1])]
    for name in VALUE_COLS:
        if name in u_cols:
            out.append(("u", None))
        else:
            out.append(("t", f"{name}-{fill}"))
    return out


def _key_cells(key):
    return [("t", key[0]), ("t", key[1])] + [("n", None)] * len(VALUE_COLS)


def _frames(spark):
    rows = [
        (0, 1, "R", bytearray(codec.encode_relation(RID, "public", "wide", "d", REL_COLUMNS))),
        (0, 10, "B", bytearray(codec.encode_begin(10, 0, 5))),
        (0, 11, "I", bytearray(codec.encode_insert(RID, _cells(("a", "b"), "v1")))),
        (0, 12, "U", bytearray(codec.encode_update(RID, _cells(("a", "b"), "v2", U_COLS)))),
        (0, 13, "C", bytearray(codec.encode_commit(12, 13, 0))),
    ]
    from pypgoutput_spark.wal.generator import FRAMES_SCHEMA

    return spark.createDataFrame(rows, schema=FRAMES_SCHEMA)


@pytest.mark.parametrize("vectorized", [True, False])
def test_wide_relation_decode_projection(spark, vectorized):
    frames = _frames(spark)
    registry = RelationRegistry.from_frames(frames)
    raw = decode_op.decode_frames_raw(frames, registry, vectorized=vectorized)
    rv = registry.latest(RID)
    proj = decode_op.project_relation(raw, rv).toPandas().sort_values("lsn")
    assert len(proj) == 2
    upd = proj[proj["op"] == "U"].iloc[0]
    # 'u' flags exactly on the two TOASTed columns (cells 5 and 70)
    for name in VALUE_COLS:
        assert bool(upd[f"u_{name}"]) == (name in U_COLS), name
    assert upd["c0"] == "c0-v2" and upd["c68"] is None
    ins = proj[proj["op"] == "I"].iloc[0]
    assert not any(bool(ins[f"u_{n}"]) for n in VALUE_COLS)


def test_wide_relation_merge_roundtrip(spark, tmp_path):
    """Full pipeline over the 100-column relation: the TOASTed cells of
    the update must preserve the insert's values through the merge."""
    table = LakeTable.create(
        spark, str(tmp_path / "wide_lake"),
        schema=[(n, "string") for n, _ in COLS],
        key_cols=KEYS, n_buckets=2,
    )
    m = pipeline.apply_frames_batch(table, _frames(spark), relation_id=RID)
    assert not m["skipped"]
    rows = table.read().collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["k0"], r["k1"]) == ("a", "b")
    for name in VALUE_COLS:
        want = f"{name}-v1" if name in U_COLS else f"{name}-v2"
        assert r[name] == want, (name, r[name])
