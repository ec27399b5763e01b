"""Bucket-count evolution: LakeTable.rebucket rewrites the table under a
new hash-bucket count without changing logical state — layout evolution
for a table whose creation-time n_buckets no longer fits its volume.

Pinned: state identity across the rewrite (deltas folded in), the new
layout actually spreading rows across the new count, merges and point
lookups operating under the new count afterwards, the change feed
skipping the layout commit, and the whole-table conflict guard
(any commit racing the rewrite aborts it)."""

from __future__ import annotations

import pytest

from pypgoutput_spark.lake.table import CommitConflict, LakeTable
from pypgoutput_spark.operators.merge import merge_into

CH_SCHEMA = (
    "k STRING, final_op STRING, max_lsn BIGINT, "
    "r_a STRUCT<v: STRING>, r_b STRUCT<v: STRING>"
)


def _mk(spark, tmp_path, n_keys=60):
    t = LakeTable.create(
        spark, str(tmp_path / "lake"),
        schema=[("k", "string"), ("a", "string"), ("b", "string")],
        key_cols=["k"], n_buckets=4,
    )
    rows = [(f"k{i}", "I", 100 + i, {"v": f"a{i}"}, {"v": f"b{i}"})
            for i in range(n_keys)]
    merge_into(t, spark.createDataFrame(rows, schema=CH_SCHEMA),
               watermark_lsn=100 + n_keys)
    # dirty state: an uncompacted delta commit (update + delete)
    merge_into(t, spark.createDataFrame(
        [("k3", "U", 500, {"v": "a3new"}, None),
         ("k5", "D", 501, None, None)],
        schema=CH_SCHEMA), watermark_lsn=501, auto_compact=False)
    return t


def _state(t):
    return {r["k"]: (r["a"], r["b"]) for r in t.read().collect()}


def test_rebucket_preserves_state_and_relayouts(spark, tmp_path):
    t = _mk(spark, tmp_path)
    before = _state(t)
    wm = t.watermark_lsn
    v = t.rebucket(16)
    snap = t.snapshot()
    assert snap["version"] == v and snap["n_buckets"] == 16
    assert _state(t) == before
    assert t.watermark_lsn == wm, "rebucket must be watermark-neutral"
    assert not snap.get("deltas"), "deltas are folded into the new layout"
    used = {int(b) for b in snap["buckets"]}
    assert used and max(used) >= 4, "rows must spread beyond the old count"

    # merges and lookups now operate under the new count
    merge_into(t, spark.createDataFrame(
        [("k7", "U", 600, {"v": "a7new"}, None)],
        schema=CH_SCHEMA), watermark_lsn=600, auto_compact=False)
    got = {r["k"]: (r["a"], r["b"]) for r in t.lookup(["k3", "k5", "k7"]).collect()}
    assert got == {"k3": ("a3new", "b3"), "k7": ("a7new", "b7")}
    full = len(t.read().inputFiles())
    probed = len(t.lookup(["k7"]).inputFiles())
    assert probed < full, "lookup must prune under the NEW bucket map"


def test_rebucket_feeds_nothing_to_change_feed(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v_before = t.current_version()
    v = t.rebucket(8)
    feed = t.changes(0)  # spans load + delta + rebucket: must not raise
    assert feed.where(f"_commit_version = {v}").count() == 0
    assert feed.where(f"_commit_version <= {v_before}").count() > 0


def test_merge_staged_under_old_count_conflicts_after_rebucket(spark, tmp_path):
    """The other direction of the race: a merge stages its change set
    under the pinned snapshot's bucket count; if a rebucket commits
    first, publishing those files would key deltas by the WRONG modulus
    (lost deletes, duplicate keys) — the commit's expected_n_buckets
    check must refuse."""
    t = _mk(spark, tmp_path, n_keys=12)
    old_n = t.snapshot()["n_buckets"]
    staged, dbytes = t.write_buckets(
        t.with_bucket(spark.createDataFrame(
            [("k1", "v", "v")], schema="k STRING, a STRING, b STRING")),
        t.current_version() + 1,
    )
    t.rebucket(16)
    with pytest.raises(CommitConflict, match="bucket count changed"):
        t.commit({}, [], delta_buckets=staged, dir_bytes=dbytes,
                 expected_n_buckets=old_n)
    # end-to-end: a fresh merge re-pins the NEW snapshot and lands
    merge_into(t, spark.createDataFrame(
        [("k1", "U", 900, {"v": "a1x"}, None)], schema=CH_SCHEMA),
        watermark_lsn=900, auto_compact=False)
    assert _state(t)["k1"] == ("a1x", "b1")


def test_rebucket_rejects_invalid_count(spark, tmp_path):
    t = _mk(spark, tmp_path, n_keys=8)
    with pytest.raises(ValueError, match="n_buckets"):
        t.rebucket(0)


def test_rebucket_noop_and_conflict_guard(spark, tmp_path):
    t = _mk(spark, tmp_path, n_keys=12)
    v = t.current_version()
    assert t.rebucket(4) == v, "same count is a no-op, no commit"
    # whole-table rewrites abort when ANY commit raced in
    with pytest.raises(CommitConflict, match="head moved"):
        t.commit({}, replaced_buckets=[], expected_head_version=v - 1)
    assert t.current_version() == v, "failed guard must publish nothing"


def test_rebucket_races_async_compaction(spark, tmp_path):
    """A rebucket issued while an async compaction is in flight: exactly
    one of the two whole/partial rewrites lands per attempt (the loser
    sees CommitConflict — swallowed on the maintenance thread, retried
    here), and the final state is identical either way."""
    t = _mk(spark, tmp_path)  # has a dirty bucket from _mk's delta commit
    before = _state(t)
    t.schedule_compact()
    try:
        t.rebucket(16)
    except CommitConflict:
        t.wait_maintenance()  # compaction won — retry against its head
        t.rebucket(16)
    t.wait_maintenance()
    assert t.snapshot()["n_buckets"] == 16
    assert _state(t) == before
