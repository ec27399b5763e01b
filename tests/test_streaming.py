"""Structured Streaming ingest + typed projection tests."""

from __future__ import annotations

import duckdb

from pypgoutput_spark.lake.table import LakeTable
from pypgoutput_spark.operators import decode as decode_op
from pypgoutput_spark.plans.registry import RelationRegistry
from pypgoutput_spark.streaming import pipeline
from pypgoutput_spark.wal import codec
from pypgoutput_spark.wal import generator as gen


def test_stream_ingest_available_now(spark, tmp_path):
    """File-source stream → foreachBatch merge == batch replay result."""
    p = gen.GenParams(n_txns=60, ops_per_txn=6, toast_pct=30, txns_per_segment=10)
    frames_dir = str(tmp_path / "frames")
    # land files in LSN-monotone order (the WAL-tail delivery contract:
    # the file source processes oldest-first, and the watermark guard
    # assumes monotone batches)
    frames = gen.spark_frames_df(spark, p)
    for seg_lo in range(0, 6, 2):
        (
            frames.filter(f"segment >= {seg_lo} AND segment < {seg_lo + 2}")
            .coalesce(1).write.mode("append").parquet(frames_dir)
        )
    table = LakeTable.create(
        spark, str(tmp_path / "lake"),
        schema=[(c, "string") for c in gen.ALL_COLUMNS],
        key_cols=list(gen.KEY_COLUMNS), n_buckets=8,
    )
    q = pipeline.stream_ingest(
        spark, frames_dir, table, str(tmp_path / "ckpt"), max_files_per_trigger=2
    )
    q.awaitTermination(300)
    got = (
        table.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    want = (
        duckdb.sql(gen.duckdb_final_state_sql(p, with_sha=False))
        .df().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert got[want.columns.tolist()].equals(want)
    # streaming applied several micro-batches, each committed a snapshot
    assert table.current_version() >= 2


def test_project_relation_typed(spark):
    """O19 parity: post-decode cast per the OID map (wire is always text)."""
    reg = RelationRegistry()
    rv = reg.add_relation(1, codec.decode_message(codec.encode_relation(
        777, "public", "typed_t", "d",
        [(1, "id", 23, -1), (0, "amount", 1700, (10 << 16 | 2) + 4),
         (0, "created", 1184, -1), (0, "note", 25, -1)],
    )))
    frames = spark.createDataFrame(
        [
            (0, 5, "B", bytearray(codec.encode_begin(5, 1_000_000, 42))),
            (0, 6, "I", bytearray(codec.encode_insert(
                777, [("t", "7"), ("t", "123.45"),
                      ("t", "2021-04-20 20:13:16.867121+00"), ("n", None)]))),
            (0, 7, "C", bytearray(codec.encode_commit(6, 7, 1_000_000))),
        ],
        schema=gen.FRAMES_SCHEMA,
    )
    raw = decode_op.decode_frames_raw(frames, reg)
    typed = decode_op.project_relation(raw, rv, typed=True)
    row = typed.first()
    assert row["id"] == 7
    assert float(row["amount"]) == 123.45
    assert str(typed.schema["amount"].dataType) == "DecimalType(10,2)"
    assert row["created"].year == 2021 and row["created"].month == 4
    assert row["note"] is None
    assert row["xid"] == 42 and row["begin_lsn"] == 5
