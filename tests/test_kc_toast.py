"""Key-change UPDATEs carrying unchanged-TOAST cells (operators.kc_toast).

Serial semantics: the new row's 'u' column takes the OLD key's value as
of the event — from the in-batch chain or the stored row. These tests
pin hand-crafted minimal streams (the generated-stream combination is
covered end-to-end by the cdc_keychange_final_state oracle entry)."""

from __future__ import annotations

import pytest

from pypgoutput_spark.lake.table import LakeTable
from pypgoutput_spark.streaming import pipeline
from pypgoutput_spark.wal import codec, generator as gen

RID = gen.RELATION_ID


def _mk_table(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / "lake"),
        schema=[(c, "string") for c in gen.ALL_COLUMNS],
        key_cols=list(gen.KEY_COLUMNS), n_buckets=4,
    )


def _frames(spark, rows, with_r=True):
    """rows: (lsn, mtype, payload). Adds the R frame at lsn 1."""
    data = []
    if with_r:
        data.append((0, 1, "R", bytearray(codec.encode_relation(
            RID, gen.RELATION_NAMESPACE, gen.RELATION_NAME, "d",
            gen.RELATION_COLUMNS,
        ))))
    data += [(0, lsn, m, bytearray(p)) for lsn, m, p in rows]
    return spark.createDataFrame(data, schema=gen.FRAMES_SCHEMA)


def _key(repo, path):
    return [("t", repo), ("t", path), ("n", None), ("n", None), ("n", None)]


def _full(repo, path, commit, content):
    return [("t", repo), ("t", path), ("t", commit), ("t", "py"), ("t", content)]


def _kc_toast(repo, path, commit):
    """New image with key+commit but TOAST-unchanged content."""
    return [("t", repo), ("t", path), ("t", commit), ("t", "py"), ("u", None)]


def _state(table):
    return {
        (r["repo"], r["path"]): (r["commit"], r["content"])
        for r in table.read().collect()
    }


def test_kc_toast_in_batch_chain_resolves(spark, tmp_path):
    """I(k0) → kc k0→k1 toast → kc k1→k2 toast, one batch: content must
    chain through BOTH key changes (depth 2 needs 2 passes)."""
    table = _mk_table(spark, tmp_path)
    frames = _frames(spark, [
        (10, "B", codec.encode_begin(10, 0, 7)),
        (11, "I", codec.encode_insert(RID, _full("r1", "p1", "c1", "BASE"))),
        (12, "U", codec.encode_update(
            RID, _kc_toast("r2", "p2", "c2"), _key("r1", "p1"), "K")),
        (13, "U", codec.encode_update(
            RID, _kc_toast("r3", "p3", "c3"), _key("r2", "p2"), "K")),
        (14, "C", codec.encode_commit(13, 14, 0)),
    ])
    m = pipeline.apply_frames_batch(table, frames, kc_toast_passes=3)
    assert not m["skipped"]
    assert _state(table) == {("r3", "p3"): ("c3", "BASE")}


def test_kc_toast_insufficient_passes_fails_loudly(spark, tmp_path):
    """A chain deeper than kc_toast_passes must FAIL the batch (before
    any snapshot commit), never merge NULLs."""
    table = _mk_table(spark, tmp_path)
    frames = _frames(spark, [
        (10, "B", codec.encode_begin(10, 0, 7)),
        (11, "I", codec.encode_insert(RID, _full("r1", "p1", "c1", "BASE"))),
        (12, "U", codec.encode_update(
            RID, _kc_toast("r2", "p2", "c2"), _key("r1", "p1"), "K")),
        (13, "U", codec.encode_update(
            RID, _kc_toast("r3", "p3", "c3"), _key("r2", "p2"), "K")),
        (14, "C", codec.encode_commit(13, 14, 0)),
    ])
    v0 = table.current_version()
    with pytest.raises(Exception, match="unresolved|kc_toast"):
        pipeline.apply_frames_batch(table, frames, kc_toast_passes=1)
    assert table.current_version() == v0, "failed batch must not commit"


def test_kc_toast_stored_fallback_across_batches(spark, tmp_path):
    """The old key's value lives in the TABLE (previous batch): one pass
    suffices — the stored carrier at lsn=-1 resolves it."""
    table = _mk_table(spark, tmp_path)
    b1 = _frames(spark, [
        (10, "B", codec.encode_begin(10, 0, 7)),
        (11, "I", codec.encode_insert(RID, _full("r1", "p1", "c1", "STORED"))),
        (12, "C", codec.encode_commit(11, 12, 0)),
    ])
    pipeline.apply_frames_batch(table, b1, kc_toast_passes=1)
    b2 = _frames(spark, [
        (20, "B", codec.encode_begin(20, 0, 8)),
        (21, "U", codec.encode_update(
            RID, _kc_toast("r2", "p2", "c2"), _key("r1", "p1"), "K")),
        (22, "C", codec.encode_commit(21, 22, 0)),
    ])
    pipeline.apply_frames_batch(table, b2, kc_toast_passes=1)
    assert _state(table) == {("r2", "p2"): ("c2", "STORED")}


def test_kc_toast_delete_barrier_resets(spark, tmp_path):
    """A D on the old key between its last full image and the key-change
    resets the chain: the resolved content is NULL, never the pre-delete
    value (delete-reset semantics, same as in-batch LWW)."""
    table = _mk_table(spark, tmp_path)
    frames = _frames(spark, [
        (10, "B", codec.encode_begin(10, 0, 7)),
        (11, "I", codec.encode_insert(RID, _full("r1", "p1", "c1", "GONE"))),
        (12, "D", codec.encode_delete(RID, _key("r1", "p1"))),
        (13, "U", codec.encode_update(
            RID, _kc_toast("r2", "p2", "c2"), _key("r1", "p1"), "K")),
        (14, "C", codec.encode_commit(13, 14, 0)),
    ])
    pipeline.apply_frames_batch(table, frames, kc_toast_passes=2)
    assert _state(table) == {("r2", "p2"): ("c2", None)}


def test_kc_toast_guard_raises_when_disabled(spark, tmp_path):
    """kc_toast_passes=0 (default): the combination must raise at
    runtime — enforced on the data, not only by generator contract
    (ADVICE r2)."""
    table = _mk_table(spark, tmp_path)
    frames = _frames(spark, [
        (10, "B", codec.encode_begin(10, 0, 7)),
        (11, "I", codec.encode_insert(RID, _full("r1", "p1", "c1", "BASE"))),
        (12, "U", codec.encode_update(
            RID, _kc_toast("r2", "p2", "c2"), _key("r1", "p1"), "K")),
        (13, "C", codec.encode_commit(12, 13, 0)),
    ])
    with pytest.raises(Exception, match="kc_toast_passes"):
        pipeline.apply_frames_batch(table, frames)


def test_plain_keychange_needs_no_passes(spark, tmp_path):
    """Key-change with a FULL new image keeps working with passes=0."""
    table = _mk_table(spark, tmp_path)
    frames = _frames(spark, [
        (10, "B", codec.encode_begin(10, 0, 7)),
        (11, "I", codec.encode_insert(RID, _full("r1", "p1", "c1", "A"))),
        (12, "U", codec.encode_update(
            RID, _full("r2", "p2", "c2", "B"), _key("r1", "p1"), "K")),
        (13, "C", codec.encode_commit(12, 13, 0)),
    ])
    pipeline.apply_frames_batch(table, frames)
    assert _state(table) == {("r2", "p2"): ("c2", "B")}


def test_stage_uses_reliable_checkpoint_when_configured(spark, tmp_path):
    """With a reliable checkpoint dir configured (object-store path in a
    real deployment), resolver staging leaves executor memory — the
    right durability class at 1000 executors. Runs last-ish: setting the
    dir is session-global but only switches _stage's mechanism."""
    from pypgoutput_spark.operators.kc_toast import _stage

    df0 = spark.range(5)
    staged0 = _stage(df0)
    assert staged0.count() == 5  # default: localCheckpoint

    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    df = spark.range(7)
    staged = _stage(df)
    assert staged.count() == 7
    import os

    assert any(os.scandir(str(tmp_path / "ckpt"))), "reliable checkpoint written"
