"""Merge-on-read delta semantics of the LakeTable.

The incremental merge appends per-bucket LWW delta files; readers
resolve base ∪ deltas with the same carrier aggregate the in-batch LWW
uses. These tests pin the cross-commit semantics directly against the
serial oracle: TOAST fallback through N uncompacted delta commits,
delete-reset across commits, compaction equivalence, and the
write-amplification contract (an incremental merge never rewrites base
files).
"""

from __future__ import annotations

import pytest

from pypgoutput_spark.lake.table import LakeTable
from pypgoutput_spark.operators.lww import lww_changes_flat
from pypgoutput_spark.operators.merge import merge_into


def _mk(spark, tmp_path, n_buckets=4) -> LakeTable:
    return LakeTable.create(
        spark, str(tmp_path / "lake"),
        schema=[("k", "string"), ("a", "string"), ("b", "string")],
        key_cols=["k"], n_buckets=n_buckets,
    )


def _changes(spark, rows):
    """rows: (k, final_op, max_lsn, a or None-marker, b or None-marker).

    a/b use a small DSL: ("v", x) carries value x (x may be None — an
    explicit NULL write); None carries no information (TOAST fallback).
    """
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


def _state(table):
    return {
        r["k"]: (r["a"], r["b"])
        for r in table.read().collect()
    }


def test_mor_deltas_resolve_and_fallback(spark, tmp_path):
    t = _mk(spark, tmp_path)
    # commit 1: initial load (base)
    m1 = merge_into(t, _changes(spark, [
        ("k1", "I", 10, ("v", "a1"), ("v", "b1")),
        ("k2", "I", 11, ("v", "a2"), ("v", "b2")),
        ("k3", "I", 12, ("v", "a3"), ("v", "b3")),
    ]), watermark_lsn=12)
    assert m1["mode"] == "replace"
    # commit 2: MOR deltas — update k1.a only (b falls through to base),
    # delete k2
    m2 = merge_into(t, _changes(spark, [
        ("k1", "U", 20, ("v", "a1x"), None),
        ("k2", "D", 21, None, None),
    ]), watermark_lsn=21, auto_compact=False)
    assert m2["mode"] == "mor" and m2["deletes"] == 1
    assert t.snapshot().get("deltas"), "expected uncompacted delta dirs"
    assert _state(t) == {"k1": ("a1x", "b1"), "k3": ("a3", "b3")}
    # commit 3: re-insert k2 with NO info for b (toast-'u' after delete):
    # b must be NULL (delete reset), never resurrect b2
    m3 = merge_into(t, _changes(spark, [
        ("k2", "I", 30, ("v", "a2y"), None),
        ("k1", "U", 31, None, ("v", None)),  # explicit NULL write to b
    ]), watermark_lsn=31, auto_compact=False)
    assert m3["mode"] == "mor"
    assert _state(t) == {
        "k1": ("a1x", None), "k2": ("a2y", None), "k3": ("a3", "b3"),
    }


def test_mor_incremental_never_rewrites_base(spark, tmp_path):
    """Write-amplification contract: a MOR merge leaves every base dir
    of the previous snapshot untouched and in place."""
    t = _mk(spark, tmp_path)
    merge_into(t, _changes(spark, [
        (f"k{i}", "I", 10 + i, ("v", f"a{i}"), ("v", f"b{i}")) for i in range(50)
    ]), watermark_lsn=100)
    base_before = dict(t.snapshot()["buckets"])
    merge_into(t, _changes(spark, [
        (f"k{i}", "U", 200 + i, ("v", f"A{i}"), None) for i in range(50)
    ]), watermark_lsn=300, auto_compact=False)
    snap = t.snapshot()
    assert snap["buckets"] == base_before, "MOR merge must not touch base"
    # every touched bucket has exactly one delta dir
    assert all(len(dd) == 1 for dd in snap["deltas"].values())
    assert _state(t)["k7"] == ("A7", "b7")


def test_mor_compaction_equivalence(spark, tmp_path):
    t = _mk(spark, tmp_path)
    merge_into(t, _changes(spark, [
        (f"k{i}", "I", 10 + i, ("v", f"a{i}"), ("v", f"b{i}")) for i in range(20)
    ]), watermark_lsn=100)
    for j in range(3):
        merge_into(t, _changes(spark, [
            (f"k{i}", "U", 200 + j * 50 + i, ("v", f"a{i}.{j}"), None)
            for i in range(j, 20, 3)
        ]), watermark_lsn=200 + j * 50 + 40, auto_compact=False)
    before = _state(t)
    wm = t.watermark_lsn
    assert t.snapshot()["deltas"]
    v = t.compact()
    assert v is not None
    snap = t.snapshot()
    assert not snap["deltas"], "compaction must clear deltas"
    assert t.watermark_lsn == wm, "compaction is watermark-neutral"
    assert _state(t) == before, "compaction must not change the state"
    # idempotent: nothing left to compact
    assert t.compact() is None


def test_mor_auto_compact_by_commit_count(spark, tmp_path):
    t = _mk(spark, tmp_path, n_buckets=2)
    merge_into(t, _changes(spark, [
        ("k1", "I", 1, ("v", "a"), ("v", "b")),
    ]), watermark_lsn=1)
    # drive many tiny delta commits; the commit-count bound must trigger
    # compaction through the merge's auto_compact hook (async by default
    # — join the maintenance thread before asserting the bound)
    for j in range(40):
        merge_into(t, _changes(spark, [
            ("k1", "U", 10 + j, ("v", f"a{j}"), None),
        ]), watermark_lsn=10 + j)
    t.wait_maintenance()
    snap = t.snapshot()
    n_dirs = sum(len(dd) for dd in snap.get("deltas", {}).values())
    assert n_dirs <= 33, f"auto-compaction should bound delta dirs, got {n_dirs}"
    assert _state(t)["k1"] == ("a39", "b")


def test_mor_watermark_idempotent_replay(spark, tmp_path):
    t = _mk(spark, tmp_path)
    merge_into(t, _changes(spark, [("k1", "I", 10, ("v", "a"), ("v", "b"))]),
               watermark_lsn=10)
    merge_into(t, _changes(spark, [("k1", "U", 20, ("v", "a2"), None)]),
               watermark_lsn=20, auto_compact=False)
    v = t.current_version()
    m = merge_into(t, _changes(spark, [("k1", "U", 20, ("v", "a2"), None)]),
                   watermark_lsn=20, auto_compact=False)
    assert m["skipped"] and m["reason"] == "watermark"
    assert t.current_version() == v
    assert _state(t)["k1"] == ("a2", "b")


def test_mor_schema_evolution_over_deltas(spark, tmp_path):
    """Metadata-only ADD over a table with outstanding deltas: old delta
    files lack r_<newcol> → resolution falls through to base → NULL."""
    from pypgoutput_spark.plans.registry import SchemaAction

    t = _mk(spark, tmp_path)
    merge_into(t, _changes(spark, [("k1", "I", 10, ("v", "a"), ("v", "b"))]),
               watermark_lsn=10)
    merge_into(t, _changes(spark, [("k1", "U", 20, ("v", "a2"), None)]),
               watermark_lsn=20, auto_compact=False)
    t.evolve_schema([SchemaAction("add", "c", "string")])
    rows = t.read().collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["a"], r["b"], r["c"]) == ("a2", "b", None)
