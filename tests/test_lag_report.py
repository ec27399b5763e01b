"""Applied-lag observability: watermark vs spool head.

The reference surfaces only the socket flush ack (reader.py:268-283);
once frames land durably the operational question is APPLIED lag —
how far each mirror's watermark trails the spool — which only the sink
side can answer. One metadata-only aggregate; per-table numbers."""

from __future__ import annotations

from pypgoutput_spark.lake.table import LakeTable
from pypgoutput_spark.streaming import pipeline
from pypgoutput_spark.wal import generator as gen

P = gen.GenParams(
    n_txns=60, ops_per_txn=6, n_repos=20, n_paths=12,
    toast_pct=20, txns_per_segment=10,
)


def _table(spark, tmp_path, name="lake"):
    return LakeTable.create(
        spark, str(tmp_path / name),
        schema=[(c, "string") for c in gen.ALL_COLUMNS],
        key_cols=list(gen.KEY_COLUMNS), n_buckets=4,
    )


def test_lag_drains_to_zero(spark, tmp_path):
    frames = gen.spark_frames_df(spark, P)
    table = _table(spark, tmp_path)
    rep = pipeline.lag_report(frames, table)[gen.RELATION_ID]
    assert rep["watermark_lsn"] == -1
    assert rep["segments_pending"] == 6
    assert rep["lsn_lag"] == rep["spool_max_lsn"] + 1

    # apply the first half of the spool only
    half = frames.filter("segment < 3")
    pipeline.run_ingest(spark, half, table, n_batches=1)
    rep = pipeline.lag_report(frames, table)[gen.RELATION_ID]
    assert rep["segments_pending"] == 3
    assert rep["frames_pending"] == frames.filter("segment >= 3").count()
    assert rep["lsn_lag"] > 0
    assert rep["watermark_lsn"] == half.agg({"lsn": "max"}).collect()[0][0]

    # catch up: lag 0, nothing pending
    pipeline.run_ingest(spark, frames, table, n_batches=1)
    rep = pipeline.lag_report(frames, table)[gen.RELATION_ID]
    assert rep == {
        "watermark_lsn": rep["spool_max_lsn"],
        "spool_max_lsn": rep["spool_max_lsn"],
        "lsn_lag": 0,
        "segments_pending": 0,
        "frames_pending": 0,
    }


def test_lag_per_table_watermarks_differ(spark, tmp_path):
    p2 = gen.GenParams(
        n_txns=60, ops_per_txn=6, n_repos=20, n_paths=12,
        toast_pct=20, txns_per_segment=10, n_relations=2,
    )
    frames = gen.spark_frames_df(spark, p2)
    tables = {
        gen.RELATION_ID + r: _table(spark, tmp_path, f"lake_{r}")
        for r in range(2)
    }
    # only table 0 ingests the first half: its lag shrinks, table 1's
    # stays at genesis
    pipeline.run_ingest(spark, frames.filter("segment < 3"),
                        tables[gen.RELATION_ID], n_batches=1)
    rep = pipeline.lag_report(frames, tables)
    r0, r1 = rep[gen.RELATION_ID], rep[gen.RELATION_ID + 1]
    assert r0["segments_pending"] == 3 and r1["segments_pending"] == 6
    assert r1["watermark_lsn"] == -1
    assert r0["lsn_lag"] < r1["lsn_lag"]
    assert r0["spool_max_lsn"] == r1["spool_max_lsn"]
