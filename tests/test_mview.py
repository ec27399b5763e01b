"""Incremental MV maintenance ≡ recompute, across merges, TOAST
carriers, deletes, truncate resets, and a mid-stream restart."""

from __future__ import annotations

import tempfile

import pytest

from pypgoutput_spark.lake.table import LakeTable
from pypgoutput_spark.operators.mview import incremental_group_mv
from pypgoutput_spark.streaming import pipeline as _pipeline
from pypgoutput_spark.wal import generator as _gen

# four batches of 10 txns: v1 initial base load, v2-v3 MOR delta merges
# (pre-image path), then the truncate at txn 25 makes batch 3 a rewrite —
# and batch 4 a delta merge OVER the post-truncate state
P = _gen.GenParams(
    n_txns=40, ops_per_txn=6, n_repos=20, n_paths=12,
    toast_pct=40, truncate_every=25, txns_per_segment=10,
)


@pytest.fixture(scope="module")
def table(spark):
    tmp = tempfile.mkdtemp(prefix="mview_lake_")
    t = LakeTable.create(
        spark, f"{tmp}/lake",
        schema=[(c, "string") for c in _gen.ALL_COLUMNS],
        key_cols=list(_gen.KEY_COLUMNS), n_buckets=8,
    )
    frames = _gen.spark_frames_df(spark, P)
    _pipeline.run_ingest(spark, frames, t, n_batches=4)
    return t


def _recompute(t):
    return {
        r["lang"]: (r["n_docs"], r["n_chars"])
        for r in t.read()
        .selectExpr("lang", "length(content) AS l")
        .groupBy("lang")
        .agg({"*": "count", "l": "sum"})
        .withColumnRenamed("count(1)", "n_docs")
        .withColumnRenamed("sum(l)", "n_chars")
        .collect()
    }


def _as_dict(mv):
    return {r["lang"]: (r["n_docs"], r["n_chars"]) for r in mv.collect()}


def test_incremental_mv_equals_recompute(spark, table):
    # the commit history must mix the three feed shapes: base loads
    # (initial + truncate rewrite) AND MOR delta merges with pre-images
    assert table.current_version() >= 4
    hist = table.history()
    assert any(s.get("metrics", {}).get("truncated") for s in hist)
    assert any(
        table.delta_dirs_added(s["version"]) for s in hist if "version" in s
    ) or any(s.get("deltas") for s in hist)
    mv = incremental_group_mv(table, group_col="lang", length_col="content")
    got = _as_dict(mv)
    assert got and got == _recompute(table)


def test_incremental_mv_restartable(spark, table):
    # maintain to a mid version, then resume from that state: the
    # consumer-checkpoint shape (store MV + last version, continue)
    cur = table.current_version()
    mid = cur // 2
    assert 0 < mid < cur

    class _Bounded:
        def __init__(self, t, until):
            self._t, self._until = t, until

        def __getattr__(self, n):
            return getattr(self._t, n)

        def current_version(self):
            return self._until

    mv_mid = incremental_group_mv(
        _Bounded(table, mid), group_col="lang", length_col="content"
    )
    mv_full = incremental_group_mv(
        table, group_col="lang", length_col="content",
        since_version=mid, mv=mv_mid,
    )
    assert _as_dict(mv_full) == _recompute(table)


def test_mv_rejects_key_or_unknown_columns(spark, table):
    with pytest.raises(ValueError, match="value column"):
        incremental_group_mv(table, group_col="repo", length_col="content")
    with pytest.raises(ValueError, match="value column"):
        incremental_group_mv(table, group_col="lang", length_col="nope")


def test_mv_over_cow_commits(spark, tmp_path):
    """COW commits feed from their sidecar (s['cdf']); the MV must fold
    them — including a TOAST carrier resolved from the pre-image and a
    delete driving a group's count to zero — exactly like MOR deltas."""
    from pypgoutput_spark.operators.merge import merge_into
    from tests.test_lake_maintenance import _changes, _mk

    t = _mk(spark, tmp_path, name="mv_cow")
    merge_into(t, _changes(spark, [
        ("k1", "I", 10, ("v", "g1"), ("v", "xx")),
        ("k2", "I", 11, ("v", "g1"), ("v", "yyy")),
        ("k3", "I", 12, ("v", "g2"), ("v", "z")),
    ]), watermark_lsn=12)
    merge_into(t, _changes(spark, [
        ("k1", "U", 20, ("v", "g2"), None),   # group move, TOAST'd b
        ("k3", "D", 21, None, None),          # g2 loses its only row...
    ]), watermark_lsn=21, mode="cow", auto_compact=False)
    merge_into(t, _changes(spark, [
        ("k2", "U", 30, ("v", "g3"), ("v", "wwww")),
    ]), watermark_lsn=30, mode="cow", auto_compact=False)

    from pypgoutput_spark.operators.mview import incremental_group_mv

    out = incremental_group_mv(t, group_col="a", length_col="b")
    mv = {r["a"]: (r["n_docs"], r["n_chars"]) for r in out.collect()}
    # final state: k1=(g2, xx), k2=(g3, wwww) -> g1 fully gone
    assert mv == {"g2": (1, 2), "g3": (1, 4)}
