"""Key-scoped erasure (right-to-be-forgotten / takedown).

`LakeTable.erase` must remove the victims from the resolved state AND
from every physical file once retention passes (the Delta
DELETE + VACUUM contract), while feeding downstream mirrors 'D' rows
that never re-disclose the erased values. A CDC 'D' event cannot do
this job: it upserts a tombstone into history; erasure makes the bytes
unrecoverable.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
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


SENTINEL = "ERASE_ME_SENTINEL"


def _seed(spark, t: LakeTable):
    """Initial load + one MOR delta batch so erase exercises the fold:
    k1 (victim, updated in the delta), k2 (victim, base-only),
    k3/k4 survivors."""
    merge_into(t, _changes(spark, [
        ("k1", "I", 10, ("v", f"{SENTINEL}_k1_base"), ("v", "b1")),
        ("k2", "I", 11, ("v", f"{SENTINEL}_k2_base"), ("v", "b2")),
        ("k3", "I", 12, ("v", "keep_a3"), ("v", "keep_b3")),
        ("k4", "I", 13, ("v", "keep_a4"), ("v", "keep_b4")),
    ]), watermark_lsn=13)
    merge_into(t, _changes(spark, [
        ("k1", "U", 20, ("v", f"{SENTINEL}_k1_delta"), None),
        ("k3", "U", 21, ("v", "keep_a3v2"), None),
    ]), watermark_lsn=21)


def test_erase_final_state_metrics_and_watermark(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _seed(spark, t)
    ver_before = t.current_version()
    wm_before = t.watermark_lsn

    victims = spark.createDataFrame([("k1",), ("k2",)], "k STRING")
    ver = t.erase(victims)
    assert ver == ver_before + 1

    state = {r["k"]: (r["a"], r["b"]) for r in t.read().collect()}
    assert state == {
        "k3": ("keep_a3v2", "keep_b3"),
        "k4": ("keep_a4", "keep_b4"),
    }
    snap = t.snapshot()
    assert snap["watermark_lsn"] == wm_before, "erase is watermark-neutral"
    m = snap["metrics"]["erasure"]
    assert m["n_keys"] == 2 and m["n_erased"] == 2
    # the victims' pending delta folded into the rewrite: affected
    # buckets carry no delta dirs anymore
    for b in m["buckets"]:
        assert not snap.get("deltas", {}).get(str(b))


def test_erase_feeds_deletes_without_values(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _seed(spark, t)
    ver_before = t.current_version()
    t.erase(spark.createDataFrame([("k1",), ("nope",)], "k STRING"))

    feed = t.changes(ver_before).collect()
    assert len(feed) == 1, "one D row per victim that existed — no row for 'nope'"
    r = feed[0]
    assert (r["k"], r["final_op"]) == ("k1", "D")
    # the feed must not re-disclose what is being erased
    assert r["a"] is None and r["b"] is None
    assert not r["upd_a"] and not r["upd_b"]
    assert r["_commit_version"] == ver_before + 1


def test_erase_missing_keys_is_noop(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _seed(spark, t)
    ver = t.current_version()
    assert t.erase(spark.createDataFrame([("ghost",)], "k STRING")) is None
    assert t.current_version() == ver


def _all_parquet_values(path: str) -> str:
    out = []
    for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True):
        out.append(str(pq.read_table(f).to_pylist()))
    return "\n".join(out)


def test_erase_physical_purge_after_retention(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _seed(spark, t)
    t.erase(spark.createDataFrame([("k1",), ("k2",)], "k STRING"))

    # before retention passes, prior snapshots still reference files
    # holding the victims' bytes — erasure alone is logical
    blob = _all_parquet_values(t.path)
    assert SENTINEL in blob

    t.expire_snapshots(keep_last=1, orphan_grace_sec=0.0)

    blob = _all_parquet_values(t.path)
    assert SENTINEL not in blob, "victim content must be physically gone"
    # detection sanity: survivors' content is still readable in the files
    assert "keep_a3v2" in blob and "keep_b4" in blob
    # and the table still reads correctly
    assert {r["k"] for r in t.read().collect()} == {"k3", "k4"}


def test_erase_then_reingest_key(spark, tmp_path):
    """A key erased and later re-written by CDC is a NEW row — erase
    must not leave state that blocks or corrupts a later upsert."""
    t = _mk(spark, tmp_path)
    _seed(spark, t)
    t.erase(spark.createDataFrame([("k1",)], "k STRING"))
    merge_into(t, _changes(spark, [
        ("k1", "I", 30, ("v", "fresh_a"), ("v", "fresh_b")),
    ]), watermark_lsn=30)
    state = {r["k"]: (r["a"], r["b"]) for r in t.read().collect()}
    assert state["k1"] == ("fresh_a", "fresh_b")
    assert t.watermark_lsn == 30


def test_redact_state_feed_and_purge(spark, tmp_path):
    """Column-scoped redaction: the row survives, the named columns are
    replaced (or NULLed), the feed carries only the replacements, and
    after retention no original byte remains."""
    t = _mk(spark, tmp_path)
    _seed(spark, t)
    ver_before = t.current_version()

    ver = t.redact(
        spark.createDataFrame([("k1",)], "k STRING"),
        {"a": "[REDACTED]", "b": None},
    )
    assert ver == ver_before + 1

    state = {r["k"]: (r["a"], r["b"]) for r in t.read().collect()}
    assert state["k1"] == ("[REDACTED]", None), "row stays, values replaced"
    assert state["k3"] == ("keep_a3v2", "keep_b3"), "others untouched"
    assert len(state) == 4

    m = t.snapshot()["metrics"]["redaction"]
    assert m["n_keys"] == 1 and m["n_redacted"] == 1
    assert m["columns"] == ["a", "b"]

    feed = t.changes(ver_before).collect()
    assert len(feed) == 1
    r = feed[0]
    assert (r["k"], r["final_op"]) == ("k1", "U")
    # the feed carries ONLY the replacements — never the originals
    assert r["a"] == "[REDACTED]" and r["upd_a"]
    assert r["b"] is None and r["upd_b"], "None replacement = explicit NULL"

    t.expire_snapshots(keep_last=1, orphan_grace_sec=0.0)
    blob = _all_parquet_values(t.path)
    assert f"{SENTINEL}_k1" not in blob, "original bytes physically gone"
    assert f"{SENTINEL}_k2_base" in blob, "non-victim rows keep their bytes"
    assert "[REDACTED]" in blob


def test_redact_key_column_raises(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _seed(spark, t)
    with pytest.raises(ValueError, match="value columns"):
        t.redact(spark.createDataFrame([("k1",)], "k STRING"), {"k": "x"})
    with pytest.raises(ValueError, match="value columns"):
        t.redact(spark.createDataFrame([("k1",)], "k STRING"), {"nope": "x"})


def test_redact_missing_keys_is_noop(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _seed(spark, t)
    ver = t.current_version()
    assert t.redact(
        spark.createDataFrame([("ghost",)], "k STRING"), {"a": "x"}
    ) is None
    assert t.current_version() == ver


def test_erase_skips_buckets_without_victims(spark, tmp_path):
    """A probe key that hashes to a populated bucket but has NO row
    there must not drag that bucket into the rewrite (content-identical
    rewrite + widened CommitConflict surface): the affected-bucket list
    in the commit metrics must be identical with and without the absent
    key in the probe."""
    t1, t2 = _mk(spark, tmp_path, "a"), _mk(spark, tmp_path, "b")
    for t in (t1, t2):
        _seed(spark, t)
    v1 = t1.erase(spark.createDataFrame([("k1",)], "k string"))
    assert v1 is not None
    only_k1 = t1.snapshot()["metrics"]["erasure"]["buckets"]
    v2 = t2.erase(spark.createDataFrame(
        [("k1",), ("absent-key-xyz",)], "k string"))
    assert v2 is not None
    m2 = t2.snapshot()["metrics"]["erasure"]
    assert m2["buckets"] == only_k1
    assert m2["n_erased"] == 1 and m2["n_keys"] == 2
    # table state identical either way
    assert sorted(r["k"] for r in t2.read().collect()) == \
        sorted(r["k"] for r in t1.read().collect())


def test_redact_empty_replacements_raises(spark, tmp_path):
    t = _mk(spark, tmp_path, "er")
    _seed(spark, t)
    with pytest.raises(ValueError, match="at least one replacement"):
        t.redact(spark.createDataFrame([("k1",)], "k string"), {})
