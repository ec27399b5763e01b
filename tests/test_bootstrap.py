"""Initial-snapshot bootstrap + WAL catch-up (LakeTable.bootstrap_load).

The Debezium-style two-phase onboarding the reference lacks (reference
reader.py:334-390 tails a slot with no snapshot mode): bulk-load a
consistent snapshot of the source table at the slot's consistent LSN,
then catch up from WAL — the snapshot/WAL overlap must replay as a
no-op, TOAST-'u' catch-up events must resolve against the bulk-loaded
base, and the result must equal a full-history replay.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from pypgoutput_spark.lake.table import LakeTable
from pypgoutput_spark.streaming import pipeline
from pypgoutput_spark.wal import generator as gen

#: full history: 40 txns, no truncates (a truncate mid-catch-up would
#: wipe the evidence that catch-up resolves against the loaded base)
P_FULL = gen.GenParams(
    n_txns=40, ops_per_txn=8, n_repos=16, n_paths=10,
    toast_pct=40, txns_per_segment=10,
)
#: the source table "exists" through txn 20 (segments 0-1); the slot's
#: consistent point S is that prefix's max LSN
P_PREFIX = gen.GenParams(
    n_txns=20, ops_per_txn=8, n_repos=16, n_paths=10,
    toast_pct=40, txns_per_segment=10,
)


def _mk_table(spark, tmp_path, name: str) -> LakeTable:
    return LakeTable.create(
        spark,
        str(tmp_path / name),
        schema=[(c, "string") for c in gen.ALL_COLUMNS],
        key_cols=list(gen.KEY_COLUMNS),
        n_buckets=8,
    )


def _sorted_state(table: LakeTable) -> pd.DataFrame:
    df = table.read().toPandas()
    return df.sort_values(["repo", "path"]).reset_index(drop=True)


@pytest.fixture(scope="module")
def booted(spark, tmp_path_factory):
    """(bootstrapped table, snapshot LSN S, snapshot row count) shared by
    the read-only assertions below."""
    tmp = tmp_path_factory.mktemp("bootstrap")
    # the "existing database table": replay the prefix into a scratch
    # mirror and SELECT * from it — the sandbox analog of the exported
    # consistent snapshot a real CREATE_REPLICATION_SLOT hands back
    src = _mk_table(spark, tmp, "src")
    pipeline.run_ingest(spark, gen.spark_frames_df(spark, P_PREFIX), src)
    snapshot_rows = src.read()
    s_lsn = src.watermark_lsn
    assert s_lsn >= 0
    n_snap = snapshot_rows.count()
    assert n_snap > 0

    mirror = _mk_table(spark, tmp, "mirror")
    v = mirror.bootstrap_load(snapshot_rows, watermark_lsn=s_lsn)
    assert v == 1 and mirror.watermark_lsn == s_lsn
    # catch-up over the FULL retained WAL: the prefix overlap must be
    # skipped by the watermark, txns 21-40 applied
    pipeline.run_ingest(
        spark, gen.spark_frames_df(spark, P_FULL), mirror, n_batches=2
    )
    return mirror, s_lsn, n_snap


def test_bootstrap_catchup_equals_full_replay(spark, booted, tmp_path):
    mirror, _s, _n = booted
    full = _mk_table(spark, tmp_path, "full")
    pipeline.run_ingest(spark, gen.spark_frames_df(spark, P_FULL), full,
                        n_batches=2)
    got, want = _sorted_state(mirror), _sorted_state(full)
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want[got.columns.tolist()],
                                  check_dtype=False)
    # the catch-up really exercised TOAST-'u' against the loaded base:
    # the tail must carry 'u' events for keys present in the snapshot
    ev = duckdb.sql(gen.duckdb_events_sql(P_FULL)).df()
    tail_u = ev[(ev["lsn"] > _s) & ev["content_unchanged"]]
    assert len(tail_u) > 0, "fixture lost its TOAST catch-up coverage"


def test_bootstrap_overlap_replay_is_noop(spark, booted):
    mirror, s_lsn, _n = booted
    v_before = mirror.current_version()
    wm_before = mirror.watermark_lsn
    # replaying the already-applied prefix (and the already-caught-up
    # full stream) must not move the table: exactly-once across the
    # snapshot/WAL overlap
    pipeline.run_ingest(spark, gen.spark_frames_df(spark, P_PREFIX), mirror)
    pipeline.run_ingest(spark, gen.spark_frames_df(spark, P_FULL), mirror)
    assert mirror.current_version() == v_before
    assert mirror.watermark_lsn == wm_before
    assert s_lsn <= wm_before


def test_bootstrap_change_feed_covers_the_load(spark, booted):
    mirror, s_lsn, n_snap = booted
    feed = mirror.changes(0).toPandas()
    boot = feed[feed["_commit_version"] == 1]
    # every snapshot row surfaces as an upsert stamped at the consistent
    # point (the Debezium snapshot-'r' analog), ordered before catch-up
    assert len(boot) == n_snap
    assert set(boot["final_op"]) == {"U"}
    assert set(boot["max_lsn"]) == {s_lsn}
    tail = feed[feed["_commit_version"] > 1]
    assert len(tail) > 0 and (tail["max_lsn"] > s_lsn).all()


def test_bootstrap_then_stream_catchup(spark, tmp_path):
    """The production onboarding shape: bulk snapshot load, then a
    Structured-Streaming tail over the slot's retained WAL files —
    including files wholly below the consistent point, which the
    per-micro-batch watermark guard must skip as late replays."""
    src = _mk_table(spark, tmp_path, "src")
    pipeline.run_ingest(spark, gen.spark_frames_df(spark, P_PREFIX), src)
    mirror = _mk_table(spark, tmp_path, "mirror")
    mirror.bootstrap_load(src.read(), watermark_lsn=src.watermark_lsn)

    frames_dir = str(tmp_path / "frames")
    frames = gen.spark_frames_df(spark, P_FULL)
    for seg_lo in range(0, 4):  # one file per segment, LSN-monotone
        (
            frames.filter(f"segment = {seg_lo}")
            .coalesce(1).write.mode("append").parquet(frames_dir)
        )
    q = pipeline.stream_ingest(
        spark, frames_dir, mirror, str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(300)
    got = _sorted_state(mirror)
    want = (
        duckdb.sql(gen.duckdb_final_state_sql(P_FULL, with_sha=False))
        .df().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=False
    )


def test_bootstrap_refuses_nonempty_and_bad_watermark(spark, tmp_path):
    t = _mk_table(spark, tmp_path, "guard")
    rows = t.read()  # empty, right schema
    with pytest.raises(ValueError, match="watermark_lsn"):
        t.bootstrap_load(rows, watermark_lsn=-1)
    pipeline.run_ingest(spark, gen.spark_frames_df(spark, P_PREFIX), t)
    with pytest.raises(ValueError, match="empty table"):
        t.bootstrap_load(rows, watermark_lsn=t.watermark_lsn + 1)


def test_bootstrap_conflicts_with_racing_commit(spark, tmp_path, monkeypatch):
    """The emptiness check is revalidated at publish: an ingest merge
    that commits between bootstrap_load's snapshot() and its commit()
    must raise CommitConflict — not be silently clobbered (base dirs
    overlaid, watermark regressed)."""
    from pypgoutput_spark.lake.table import CommitConflict

    table = _mk_table(spark, tmp_path, "race")
    rows = spark.createDataFrame(
        [("r1", "p1", "c", "py", "x")],
        schema=", ".join(f"`{c}` string" for c in gen.ALL_COLUMNS),
    )
    other = LakeTable(spark, table.path)  # the racing writer's handle
    raced = [False]
    orig_write = LakeTable.write_buckets

    def write_and_race(self, staged, ver, **kw):
        out = orig_write(self, staged, ver, **kw)
        if not raced[0]:  # fire once, between bootstrap's stage+commit
            raced[0] = True
            pipeline.run_ingest(
                spark, gen.spark_frames_df(spark, P_PREFIX), other
            )
        return out

    monkeypatch.setattr(LakeTable, "write_buckets", write_and_race)
    with pytest.raises(CommitConflict):
        table.bootstrap_load(rows, watermark_lsn=5)
    # the racing ingest's data survives untouched
    assert other.read().count() > 0 and other.watermark_lsn > 5
