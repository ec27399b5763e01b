"""WAL spool continuity guard.

A lost segment file (object-store object gone, receiver crash between
roll and flush) must stop the pipeline BEFORE any merge commits —
otherwise the watermark advances past the hole and the lost committed
transactions are unrecoverable without an operator rewind. The guard is
a metadata-only scan (payload pruned): dense segment numbering +
ordered, disjoint per-segment LSN spans.
"""

from __future__ import annotations

import pytest

from pypgoutput_spark.lake.table import LakeTable
from pypgoutput_spark.sources.frames import WalContinuityError, check_continuity
from pypgoutput_spark.streaming import pipeline
from pypgoutput_spark.wal import generator as gen

P = gen.GenParams(
    n_txns=60, ops_per_txn=6, n_repos=20, n_paths=12,
    toast_pct=20, txns_per_segment=10,
)


def _frames(spark):
    return gen.spark_frames_df(spark, P)


def test_intact_stream_passes(spark):
    out = check_continuity(_frames(spark))
    assert out["n_segments"] == 6
    assert (out["first_segment"], out["last_segment"]) == (0, 5)


def test_missing_middle_segment_raises(spark):
    holed = _frames(spark).filter("segment <> 3")
    with pytest.raises(WalContinuityError, match=r"segments 2\.\.4"):
        check_continuity(holed)


def test_hole_below_watermark_is_retention_not_loss(spark):
    # segments 0-2 fully applied (watermark = their max lsn), then
    # segment 1 expired from the spool: resume must NOT raise
    frames = _frames(spark)
    wm = frames.filter("segment <= 2").agg({"lsn": "max"}).collect()[0][0]
    pruned = frames.filter("segment <> 1")
    out = check_continuity(pruned, after_lsn=int(wm))
    # the watermark IS segment 2's max lsn; hi >= after_lsn retains it
    # as the dense-chain anchor, so the checked chain is 2..5
    assert out["first_segment"] == 2


def test_hole_above_watermark_raises(spark):
    frames = _frames(spark)
    wm = frames.filter("segment <= 1").agg({"lsn": "max"}).collect()[0][0]
    holed = frames.filter("segment <> 3")
    with pytest.raises(WalContinuityError):
        check_continuity(holed, after_lsn=int(wm))


def test_overlapping_spans_raise(spark):
    # a duplicate upload mis-numbered as the next segment: same LSN span
    frames = _frames(spark)
    dup = frames.filter("segment = 5").selectExpr(
        "segment + 1 AS segment", "lsn", "mtype", "payload"
    )
    with pytest.raises(WalContinuityError, match="overlaps"):
        check_continuity(frames.unionByName(dup))


def test_retention_edge_needs_anchor(spark):
    # segment 3 lost at the exact retention edge: undetectable from the
    # retained chain alone (4..5 is dense) — the expect_from_segment
    # anchor closes it
    frames = _frames(spark)
    wm = frames.filter("segment <= 2").agg({"lsn": "max"}).collect()[0][0]
    edge_lost = frames.filter("segment >= 4")
    assert check_continuity(edge_lost, after_lsn=int(wm))["first_segment"] == 4
    with pytest.raises(WalContinuityError, match="retention edge"):
        check_continuity(edge_lost, after_lsn=int(wm), expect_from_segment=3)
    # and the honest-retention shape passes the same anchor
    ok = frames.filter("segment >= 3")
    assert check_continuity(ok, after_lsn=int(wm),
                            expect_from_segment=3)["first_segment"] == 3


def test_run_ingest_verify_continuity_stops_before_commit(spark, tmp_path):
    table = LakeTable.create(
        spark, str(tmp_path / "lake"),
        schema=[(c, "string") for c in gen.ALL_COLUMNS],
        key_cols=list(gen.KEY_COLUMNS), n_buckets=4,
    )
    holed = _frames(spark).filter("segment <> 2")
    with pytest.raises(WalContinuityError):
        pipeline.run_ingest(spark, holed, table, n_batches=2,
                            verify_continuity=True)
    # nothing committed, watermark untouched: the stream is replayable
    # once the operator restores the segment
    assert table.current_version() == 0
    assert table.watermark_lsn == -1

    # restored spool ingests cleanly with the guard on
    pipeline.run_ingest(spark, _frames(spark), table, n_batches=2,
                        verify_continuity=True)
    assert table.current_version() > 0
    assert table.read().count() > 0


def test_lost_first_pending_segment_raises(spark):
    """The guard's HEADLINE scenario: segments 0-1 applied (watermark =
    segment 1's max LSN — what segment-split ingest always produces),
    segment 2 lost from the spool. The watermark's own segment must
    anchor the dense chain: a strict hi > watermark filter dropped it,
    leaving the dense-looking tail 3..5 and a silent pass over the lost
    committed transactions."""
    frames = _frames(spark)
    wm = frames.filter("segment <= 1").agg({"lsn": "max"}).collect()[0][0]
    holed = frames.filter("segment <> 2")
    with pytest.raises(WalContinuityError, match=r"segments 1\.\.3"):
        check_continuity(holed, after_lsn=int(wm))
    # intact spool at the same watermark still passes, chain anchored at 1
    out = check_continuity(frames, after_lsn=int(wm))
    assert out["first_segment"] == 1
