"""Cross-table epochs: each published epoch pins a mutually consistent
set of per-relation snapshot versions — the batch-boundary read point a
consumer joining multiple CDC mirrors needs (per-table commits publish
at different instants; Iceberg/Delta have no multi-table transactions).

Pinned: epoch-pinned reads reproduce exactly the per-batch states
captured during ingest, stay stable after later commits, survive an
idempotent replay (skipped merges re-publish the same versions), and
old epochs give cross-table time travel."""

from __future__ import annotations

from pypgoutput_spark.lake.epochs import EpochLog
from pypgoutput_spark.lake.table import LakeTable
from pypgoutput_spark.streaming import pipeline
from pypgoutput_spark.wal import generator as gen

P = gen.GenParams(
    n_txns=60, ops_per_txn=6, n_repos=25, n_paths=16,
    toast_pct=25, txns_per_segment=10, n_relations=2,
)


def _mk_tables(spark, tmp_path):
    return {
        gen.RELATION_ID + r: LakeTable.create(
            spark, str(tmp_path / f"lake_{r}"),
            schema=[(c, "string") for c in gen.ALL_COLUMNS],
            key_cols=list(gen.KEY_COLUMNS), n_buckets=4,
        )
        for r in range(2)
    }


def _state(df):
    return {(r["repo"], r["path"]): r["content"] for r in df.collect()}


def test_stream_ingest_publishes_epochs(spark, tmp_path):
    """The Structured-Streaming driver publishes one epoch per
    micro-batch too; the final epoch pins both tables' head versions."""
    frames_dir = str(tmp_path / "frames")
    frames = gen.spark_frames_df(spark, P)
    for seg_lo in range(0, 6, 2):
        (
            frames.filter(f"segment >= {seg_lo} AND segment < {seg_lo + 2}")
            .coalesce(1).write.mode("append").parquet(frames_dir)
        )
    tables = _mk_tables(spark, tmp_path)
    log = EpochLog.create(str(tmp_path / "epochs"))
    seen = []
    q = pipeline.stream_ingest(
        spark, frames_dir, tables, str(tmp_path / "ckpt"),
        max_files_per_trigger=1, epoch_log=log,
        on_batch=lambda m: seen.append(m.get("epoch")),
    )
    q.awaitTermination(300)
    assert seen and seen == sorted(seen)
    assert log.current_epoch() == seen[-1]
    rec = log.record()
    assert rec["tables"] == {
        str(rid): t.current_version() for rid, t in tables.items()
    }
    pinned = log.read_all(tables)
    for rid, t in tables.items():
        assert _state(pinned[rid]) == _state(t.read())


def test_epochs_pin_cross_table_batch_boundaries(spark, tmp_path):
    tables = _mk_tables(spark, tmp_path)
    log = EpochLog.create(str(tmp_path / "epochs"))
    frames = gen.spark_frames_df(spark, P)

    captured = []  # [(epoch, {rid: state})] recorded right after each batch

    def on_batch(m):
        captured.append(
            (m["epoch"], {rid: _state(t.read()) for rid, t in tables.items()})
        )

    pipeline.run_ingest(spark, frames, tables, n_batches=3,
                        epoch_log=log, on_batch=on_batch)
    assert [e for e, _ in captured] == [1, 2, 3]
    assert log.current_epoch() == 3

    # every epoch's pinned reads == the state captured at that batch,
    # for BOTH tables — even though later batches have committed since
    for epoch, states in captured:
        pinned = log.read_all(tables, epoch=epoch)
        assert set(pinned) == set(states)
        for rid, df in pinned.items():
            assert _state(df) == states[rid], (epoch, rid)

    # watermark recorded per epoch is monotone (repeats allowed — an
    # empty or replayed batch legitimately re-publishes its watermark)
    wms = [log.record(e)["watermark_lsn"] for e in (1, 2, 3)]
    assert all(a <= b for a, b in zip(wms, wms[1:]))

    # idempotent replay: re-running the same frames skips every merge
    # but still publishes an epoch pinning the SAME versions (a crash
    # between last merge and epoch publish is thereby self-healing)
    v_before = {rid: t.current_version() for rid, t in tables.items()}
    pipeline.run_ingest(spark, frames, tables, n_batches=1, epoch_log=log)
    assert log.current_epoch() == 4
    assert log.record(4)["tables"] == {str(r): v for r, v in v_before.items()}
    # and epoch-3 reads are unchanged
    for rid, df in log.read_all(tables, epoch=3).items():
        assert _state(df) == captured[-1][1][rid]

    # the multi-batch replay path short-circuits before batching (the
    # post-watermark frame set is EMPTY) — the epoch log must still
    # heal (re-publish current versions), or a crash between the last
    # merge and the publish would leave CURRENT stale forever
    out = pipeline.run_ingest(spark, frames, tables, n_batches=3,
                              epoch_log=log)
    assert out and out[0]["skipped"] and out[0]["epoch"] == 5
    assert log.record(5)["tables"] == {
        str(rid): t.current_version() for rid, t in tables.items()
    }

    # epoch-aware retention: expire the log first, then GC each table
    # with the surviving epochs' floor — an epoch-pinned read of the
    # OLDEST surviving epoch must still work afterwards
    expired = log.expire(keep_last=3)  # drops genesis + epochs 1, 2
    assert expired == [0, 1, 2]
    floors = log.retention_floor()
    for rid, t in tables.items():
        t.expire_snapshots(keep_last=1, orphan_grace_sec=0.0,
                           keep_from_version=floors[rid])
    oldest = min(int(n[1:9]) for n in
                 __import__("os").listdir(log.log_dir))
    for rid, df in log.read_all(tables, epoch=oldest).items():
        assert _state(df) == captured[oldest - 1][1][rid]


def test_concurrent_publishers_never_clobber(tmp_path):
    """Two writers sharing one log (backfill racing a live stream)
    serialize under the commit lock: every epoch id is distinct, every
    record survives."""
    import threading

    log = EpochLog.create(str(tmp_path / "epochs"))
    got = []
    lock = threading.Lock()

    def worker(wid):
        for i in range(25):
            e = log.publish({wid: i}, watermark_lsn=i)
            with lock:
                got.append(e)

    ts = [threading.Thread(target=worker, args=(w,)) for w in (1, 2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert sorted(got) == list(range(1, 51)), "epoch ids must be gap-free and unique"
    assert log.current_epoch() == 50
    for e in range(1, 51):
        log.record(e)  # every record file survived (no clobbered writes)
