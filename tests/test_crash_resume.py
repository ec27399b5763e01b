"""Crash-consistency soak: kill the driver hard at every commit point and
prove exactly-once on restart.

The exactly-once claim is that the watermark LSN commits atomically with
the data (lake.table docstring; the reference's send_feedback(flush_lsn)
ack, reader.py:374-390) and that replays at or below it are no-ops. The
soak kills a streaming child process (os._exit = SIGKILL analog)

  1. after delta files are staged but BEFORE the snapshot JSON exists,
  2. after the snapshot JSON exists but BEFORE the CURRENT pointer rename,
  3. after the snapshot published but BEFORE Spark's checkpoint commit
     (the batch is redelivered on restart → idempotent watermark skip),

then relaunches until a clean run and asserts the final table equals the
serial DuckDB oracle, with strictly monotone watermarks across every
surviving snapshot (no duplicate application, no lost batch).
"""

from __future__ import annotations

import os
import subprocess
import sys

import duckdb

from pypgoutput_spark.lake.table import LakeTable
from pypgoutput_spark.wal import generator as gen

REPO = os.path.join(os.path.dirname(__file__), "..")


def _run_child(frames_dir, lake_dir, ckpt_dir, crash_point=None, timeout=420):
    env = dict(os.environ)
    env.pop("PYPGOUT_CRASH_POINT", None)
    if crash_point:
        env["PYPGOUT_CRASH_POINT"] = crash_point
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "crash_child.py"),
         frames_dir, lake_dir, ckpt_dir],
        cwd=REPO, env=env, timeout=timeout,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    return proc.returncode


def test_crash_resume_exactly_once(spark, tmp_path):
    p = gen.GenParams(n_txns=40, ops_per_txn=5, toast_pct=30, txns_per_segment=5)
    frames_dir = str(tmp_path / "frames")
    # monotone segment-chunked files (one per micro-batch)
    frames = gen.spark_frames_df(spark, p)
    for seg in range(8):
        (
            frames.filter(f"segment = {seg}")
            .coalesce(1).write.mode("append").parquet(frames_dir)
        )
    lake_dir = str(tmp_path / "lake")
    ckpt_dir = str(tmp_path / "ckpt")

    # every kill point is a hard exit (137); clean run returns 0
    assert _run_child(frames_dir, lake_dir, ckpt_dir, "pre_snapshot:2") == 137
    assert _run_child(frames_dir, lake_dir, ckpt_dir, "pre_publish:1") == 137
    assert _run_child(frames_dir, lake_dir, ckpt_dir, "post_publish:1") == 137
    assert _run_child(frames_dir, lake_dir, ckpt_dir) == 0

    table = LakeTable(spark, lake_dir)
    stride = p.lsn_stride
    max_lsn = 10 + (p.n_txns - 1) * stride + p.ops_per_txn + 1
    assert table.watermark_lsn == max_lsn

    got = table.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    want = (
        duckdb.sql(gen.duckdb_final_state_sql(p, with_sha=False))
        .df().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert got[want.columns.tolist()].equals(want)

    # exactly-once across all surviving snapshots: watermarks strictly
    # monotone on data commits (a replayed batch never re-commits), and
    # every applied batch's lineage range is disjoint
    wms = [s["watermark_lsn"] for s in table.history() if s.get("metrics", {}).get("lineage")]
    assert wms == sorted(set(wms)), f"non-monotone watermarks: {wms}"
    ranges = [
        tuple(s["metrics"]["lineage"]["lsn_range"])
        for s in table.history() if s.get("metrics", {}).get("lineage")
    ]
    flat = sorted(ranges)
    for (a_lo, a_hi), (b_lo, b_hi) in zip(flat, flat[1:]):
        assert a_hi < b_lo, f"overlapping applied ranges: {(a_lo, a_hi)} {(b_lo, b_hi)}"


def _run_compact_child(frames_dir, lake_dir, crash_point=None, timeout=420):
    env = dict(os.environ)
    env.pop("PYPGOUT_CRASH_POINT", None)
    if crash_point:
        env["PYPGOUT_CRASH_POINT"] = crash_point
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "crash_compact_child.py"),
         frames_dir, lake_dir],
        cwd=REPO, env=env, timeout=timeout,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    return proc.returncode


def test_crash_inside_rebucket(spark, tmp_path):
    """SIGKILL with the rebucket rewrite fully staged under the new
    bucket count but unpublished: the relaunched table still reads its
    OLD layout (the crash changed nothing), a re-run rebucket lands, the
    final state equals the serial oracle under the new count, and
    expire_snapshots reclaims the dead rewrite's staging."""
    p = gen.GenParams(n_txns=30, ops_per_txn=5, toast_pct=30, txns_per_segment=5)
    frames_dir = str(tmp_path / "frames")
    gen.spark_frames_df(spark, p).write.parquet(frames_dir)
    lake_dir = str(tmp_path / "lake")

    def _run(crash_point=None):
        env = dict(os.environ)
        env.pop("PYPGOUT_CRASH_POINT", None)
        if crash_point:
            env["PYPGOUT_CRASH_POINT"] = crash_point
        return subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "crash_rebucket_child.py"),
             frames_dir, lake_dir, "16"],
            cwd=REPO, env=env, timeout=420,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        ).returncode

    assert _run("post_rebucket_stage:1") == 137
    table = LakeTable(spark, lake_dir)
    assert table.snapshot()["n_buckets"] == 4, "crashed rewrite must not publish"
    assert _run() == 0

    table = LakeTable(spark, lake_dir)
    assert table.snapshot()["n_buckets"] == 16
    got = table.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    want = (
        duckdb.sql(gen.duckdb_final_state_sql(p, with_sha=False))
        .df().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert got[want.columns.tolist()].equals(want)

    # the dead rewrite's staging is unreferenced; GC reclaims it
    report = table.expire_snapshots(keep_last=50, orphan_grace_sec=0.0)
    assert report["deleted_dirs"] > 0
    after = table.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    assert after[want.columns.tolist()].equals(want)


def test_crash_inside_compaction_fold(spark, tmp_path):
    """Round-5 (verdict #7): SIGKILL after the compaction fold is fully
    STAGED but before its commit, while ingest runs concurrently. The
    relaunched table must equal the serial oracle (the half-staged fold
    referenced by no snapshot changed nothing), exactly-once ingest must
    hold across the crash, and expire_snapshots must reclaim the
    orphaned staging."""
    p = gen.GenParams(n_txns=40, ops_per_txn=5, toast_pct=30, txns_per_segment=5)
    frames_dir = str(tmp_path / "frames")
    gen.spark_frames_df(spark, p).write.parquet(frames_dir)
    lake_dir = str(tmp_path / "lake")

    assert _run_compact_child(frames_dir, lake_dir, "post_compact_stage:1") == 137
    assert _run_compact_child(frames_dir, lake_dir) == 0

    table = LakeTable(spark, lake_dir)
    got = table.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    want = (
        duckdb.sql(gen.duckdb_final_state_sql(p, with_sha=False))
        .df().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert got[want.columns.tolist()].equals(want)

    # exactly-once held across the crash: data-commit watermarks monotone
    wms = [s["watermark_lsn"] for s in table.history()
           if s.get("metrics", {}).get("lineage")]
    assert wms == sorted(set(wms)), f"non-monotone watermarks: {wms}"

    # the crashed fold's staging is on disk but referenced by NO snapshot
    data_root = os.path.join(lake_dir, "data")
    referenced = set()
    for s in table.history():
        for dd in s["buckets"].values():
            referenced.update(os.path.normpath(d) for d in dd)
        for dd in s.get("deltas", {}).values():
            referenced.update(os.path.normpath(d) for d in dd)
    on_disk = {
        os.path.normpath(os.path.join(data_root, c, b))
        for c in os.listdir(data_root)
        if os.path.isdir(os.path.join(data_root, c))
        for b in os.listdir(os.path.join(data_root, c))
        if os.path.isdir(os.path.join(data_root, c, b))
    }
    orphans = on_disk - referenced
    assert orphans, "the killed fold must have left staged orphan dirs"

    # GC reclaims them (grace 0: the writer is dead) and the table still reads
    report = table.expire_snapshots(keep_last=3, orphan_grace_sec=0.0)
    assert report["deleted_dirs"] >= len(orphans)
    after = table.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    assert after[want.columns.tolist()].equals(want)
