"""Change-data-feed reads and snapshot expiration (lake maintenance).

`changes()` turns the MOR delta files into a downstream feed (CDC in,
CDF out) at zero extra write cost; `expire_snapshots()` bounds storage
— without it every delta/rewrite accumulates forever.
"""

from __future__ import annotations

import pytest

from pypgoutput_spark.lake.table import LakeTable
from pypgoutput_spark.operators.merge import merge_into


def _mk(spark, tmp_path, name="lake") -> LakeTable:
    return LakeTable.create(
        spark, str(tmp_path / name),
        schema=[("k", "string"), ("a", "string"), ("b", "string")],
        key_cols=["k"], n_buckets=4,
    )


def _changes(spark, rows):
    data = [
        (k, op, lsn,
         {"v": a[1]} if a is not None else None,
         {"v": b[1]} if b is not None else None)
        for k, op, lsn, a, b in rows
    ]
    return spark.createDataFrame(
        data,
        schema="k STRING, final_op STRING, max_lsn BIGINT, "
               "r_a STRUCT<v: STRING>, r_b STRUCT<v: STRING>",
    )


def _apply_feed(state: dict, feed_rows) -> dict:
    """Serial oracle: replay CDF rows (ordered by commit, lsn) onto a
    {k: (a, b)} state respecting the upd_<col> carrier flags; a 'T'
    truncate marker resets the state."""
    for r in sorted(feed_rows, key=lambda r: (r["_commit_version"], r["max_lsn"])):
        if r["final_op"] == "T":
            state.clear()
            continue
        if r["final_op"] == "D":
            state.pop(r["k"], None)
            continue
        old = state.get(r["k"], (None, None))
        state[r["k"]] = (
            r["a"] if r["upd_a"] else old[0],
            r["b"] if r["upd_b"] else old[1],
        )
    return state


def test_changes_feed_mor(spark, tmp_path):
    t = _mk(spark, tmp_path)
    merge_into(t, _changes(spark, [
        ("k1", "I", 10, ("v", "a1"), ("v", "b1")),
        ("k2", "I", 11, ("v", "a2"), ("v", "b2")),
        ("k3", "I", 12, ("v", "a3"), ("v", "b3")),
    ]), watermark_lsn=12)
    v1 = t.current_version()
    merge_into(t, _changes(spark, [
        ("k1", "U", 20, ("v", "a1x"), None),     # TOAST: b not carried
        ("k2", "D", 21, None, None),
    ]), watermark_lsn=21, auto_compact=False)
    merge_into(t, _changes(spark, [
        ("k4", "I", 30, ("v", "a4"), ("v", "b4")),
    ]), watermark_lsn=30, auto_compact=False)

    full = t.changes(0).collect()
    assert {r["final_op"] for r in full} == {"I", "U", "D"}
    k1 = next(r for r in full if r["k"] == "k1" and r["_commit_version"] > v1)
    assert k1["upd_a"] and not k1["upd_b"] and k1["a"] == "a1x"
    # replaying the full feed from empty reproduces the table exactly
    assert _apply_feed({}, full) == {
        r["k"]: (r["a"], r["b"]) for r in t.read().collect()
    }

    # incremental consumer: state-at-v1 + changes since v1 == final state
    since = t.changes(v1).collect()
    assert {r["_commit_version"] for r in since} == {v1 + 1, v1 + 2}
    start = {r["k"]: (r["a"], r["b"]) for r in t.read(version=v1).collect()}
    assert _apply_feed(start, since) == {
        r["k"]: (r["a"], r["b"]) for r in t.read().collect()
    }

    # compaction rewrites already-fed changes — contributes nothing new
    assert t.compact() is not None
    after = t.changes(v1).collect()
    assert {r["_commit_version"] for r in after} == {v1 + 1, v1 + 2}

    # copy-on-write commits feed from their sidecar (round 4): the U with
    # an uncarried b keeps its carrier flag through the rewrite
    merge_into(t, _changes(spark, [
        ("k3", "U", 40, ("v", "a3x"), None),
    ]), watermark_lsn=40, mode="cow")
    cow_feed = t.changes(v1).collect()
    k3 = next(r for r in cow_feed if r["k"] == "k3")
    assert k3["upd_a"] and not k3["upd_b"] and k3["a"] == "a3x"
    start = {r["k"]: (r["a"], r["b"]) for r in t.read(version=v1).collect()}
    assert _apply_feed(start, cow_feed) == {
        r["k"]: (r["a"], r["b"]) for r in t.read().collect()
    }
    # a base rewrite with neither deltas nor a sidecar still raises
    staged, db = t.write_buckets(t.with_bucket(t.read()), t.current_version() + 1)
    t.commit(staged, replaced_buckets=list(range(4)), dir_bytes=db)
    with pytest.raises(ValueError, match="not change-tracked"):
        t.changes(v1).collect()


def test_expire_snapshots_gc(spark, tmp_path):
    t = _mk(spark, tmp_path)
    merge_into(t, _changes(spark, [
        ("k1", "I", 10, ("v", "a1"), ("v", "b1")),
        ("k2", "I", 11, ("v", "a2"), ("v", "b2")),
    ]), watermark_lsn=11)
    for i in range(4):
        merge_into(t, _changes(spark, [
            ("k1", "U", 20 + i, ("v", f"a1-{i}"), None),
        ]), watermark_lsn=20 + i, auto_compact=False)
    assert t.compact() is not None  # old deltas now unreferenced by HEAD
    before = {r["k"]: (r["a"], r["b"]) for r in t.read().collect()}
    old_version = 1
    n_versions = t.current_version() + 1

    # keep_last=2 retains the pre-compaction snapshot, which still
    # references every delta dir — GC must delete NOTHING yet
    out2 = t.expire_snapshots(keep_last=2, orphan_grace_sec=0.0)
    assert out2["expired"] and out2["deleted_dirs"] == 0

    # keep_last=1: only the compacted HEAD remains → old base + all
    # superseded delta dirs are unreferenced and reclaimed
    out = t.expire_snapshots(keep_last=1, orphan_grace_sec=0.0)
    assert out["expired"] and out["deleted_dirs"] > 0 and out["freed_bytes"] > 0
    assert len(t.history()) == 1
    # current state untouched, expired versions unreadable, idempotent
    assert {r["k"]: (r["a"], r["b"]) for r in t.read().collect()} == before
    with pytest.raises(FileNotFoundError):
        t.snapshot(old_version)
    assert t.expire_snapshots(keep_last=1)["expired"] == []
    assert len(out2["expired"]) + len(out["expired"]) == n_versions - 1


def test_changes_feed_reconstructs_cdc_pipeline_state(spark, tmp_path):
    """CDF over the REAL pipeline: ingest a generated WAL stream (initial
    load + 2 incremental MOR batches, TOAST-'u' cells included), then
    replay `changes(0)` key-by-key respecting the carrier flags — the
    reconstruction must equal the serial DuckDB oracle's final state."""
    import duckdb

    from pypgoutput_spark.streaming import pipeline
    from pypgoutput_spark.wal import generator as gen

    p = gen.GenParams(n_txns=45, ops_per_txn=6, toast_pct=30, txns_per_segment=5)
    frames = gen.spark_frames_df(spark, p)
    table = LakeTable.create(
        spark, str(tmp_path / "cdc_lake"),
        schema=[(c, "string") for c in gen.ALL_COLUMNS],
        key_cols=list(gen.KEY_COLUMNS), n_buckets=8,
    )
    pipeline.run_ingest(spark, frames, table, n_batches=3)

    value_cols = [c for c in gen.ALL_COLUMNS if c not in gen.KEY_COLUMNS]
    state: dict = {}
    rows = table.changes(0).collect()
    for r in sorted(rows, key=lambda r: (r["_commit_version"], r["max_lsn"])):
        if r["final_op"] == "T":
            state.clear()
            continue
        key = tuple(r[k] for k in gen.KEY_COLUMNS)
        if r["final_op"] == "D":
            state.pop(key, None)
            continue
        old = state.get(key, tuple([None] * len(value_cols)))
        state[key] = tuple(
            r[c] if r[f"upd_{c}"] else old[i] for i, c in enumerate(value_cols)
        )
    want = duckdb.sql(gen.duckdb_final_state_sql(p, with_sha=False)).df()
    want_state = {
        tuple(row[k] for k in gen.KEY_COLUMNS): tuple(row[c] for c in value_cols)
        for _, row in want.iterrows()
    }

    def _norm(d):
        return {
            k: tuple(None if v is None or (isinstance(v, float)) else v for v in vs)
            for k, vs in d.items()
        }

    assert len(state) == len(want_state)
    assert _norm(state) == _norm(want_state)


def test_changes_after_expiration_is_explicit(spark, tmp_path):
    """A consumer asking for a feed range whose snapshots were expired
    gets a clear retention error, not a stray file-not-found."""
    t = _mk(spark, tmp_path)
    merge_into(t, _changes(spark, [
        ("k1", "I", 10, ("v", "a1"), ("v", "b1")),
    ]), watermark_lsn=10)
    merge_into(t, _changes(spark, [
        ("k1", "U", 20, ("v", "a1x"), None),
    ]), watermark_lsn=20, auto_compact=False)
    t.compact()
    t.expire_snapshots(keep_last=1, orphan_grace_sec=0.0)
    with pytest.raises(ValueError, match="expired"):
        t.changes(0).collect()


def test_expire_grace_protects_inflight_staging(spark, tmp_path):
    """An unreferenced staging dir with a fresh mtime (a concurrent
    writer's in-flight commit) survives expiration until the grace
    window passes; with grace 0 it is reclaimed as an orphan."""
    import os

    t = _mk(spark, tmp_path)
    merge_into(t, _changes(spark, [
        ("k1", "I", 10, ("v", "a1"), ("v", "b1")),
    ]), watermark_lsn=10)
    merge_into(t, _changes(spark, [
        ("k1", "U", 20, ("v", "a1x"), None),
    ]), watermark_lsn=20, auto_compact=False)

    fake = os.path.join(t.path, "data", "commit-inflight-deadbeef", "_bucket=0")
    os.makedirs(fake)
    with open(os.path.join(fake, "part-0.parquet"), "wb") as f:
        f.write(b"x" * 128)

    out = t.expire_snapshots(keep_last=1, orphan_grace_sec=3600.0)
    assert out["expired"] and os.path.isdir(fake)   # fresh orphan kept

    out = t.expire_snapshots(keep_last=1, orphan_grace_sec=0.0)
    assert not os.path.isdir(fake)                  # grace elapsed → reclaimed
