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


def test_stream_ingest_processing_time_trigger(spark, tmp_path):
    """Continuous micro-batch loop (processingTime trigger): files landing
    while the query runs are picked up and merged — the consume_stream
    analog (reference reader.py:334-390)."""
    import time

    p = gen.GenParams(n_txns=40, ops_per_txn=5, toast_pct=25, txns_per_segment=10)
    frames_dir = str(tmp_path / "frames")
    frames = gen.spark_frames_df(spark, p)
    # first two segments land before the stream starts
    frames.filter("segment < 2").coalesce(1).write.mode("append").parquet(frames_dir)
    table = LakeTable.create(
        spark, str(tmp_path / "lake"),
        schema=[(c, "string") for c in gen.ALL_COLUMNS],
        key_cols=list(gen.KEY_COLUMNS), n_buckets=8,
    )
    q = pipeline.stream_ingest(
        spark, frames_dir, table, str(tmp_path / "ckpt"),
        max_files_per_trigger=1, trigger={"processingTime": "1 second"},
    )
    try:
        # land the remaining segments while the query is live
        time.sleep(1.5)
        frames.filter("segment >= 2").coalesce(1).write.mode("append").parquet(frames_dir)
        max_lsn = frames.agg({"lsn": "max"}).collect()[0][0]
        deadline = time.time() + 120
        while table.watermark_lsn < max_lsn and time.time() < deadline:
            time.sleep(1)
    finally:
        q.stop()
    assert table.watermark_lsn == max_lsn
    got = table.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    want = (
        duckdb.sql(gen.duckdb_final_state_sql(p, with_sha=False))
        .df().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    assert len(got) == len(want) and got[want.columns.tolist()].equals(want)


def test_stream_late_file_guard(spark, tmp_path):
    """A frame file landing out of LSN order (below the applied watermark)
    is counted + quarantined, never silently no-op'd, and the table state
    is untouched (idempotent under the monotone-delivery contract)."""
    p = gen.GenParams(n_txns=30, ops_per_txn=5, toast_pct=25, txns_per_segment=10)
    frames_dir = str(tmp_path / "frames")
    frames = gen.spark_frames_df(spark, p)
    frames.coalesce(1).write.mode("append").parquet(frames_dir)
    table = LakeTable.create(
        spark, str(tmp_path / "lake"),
        schema=[(c, "string") for c in gen.ALL_COLUMNS],
        key_cols=list(gen.KEY_COLUMNS), n_buckets=8,
    )
    ckpt = str(tmp_path / "ckpt")
    qdir = str(tmp_path / "quarantine")
    q = pipeline.stream_ingest(spark, frames_dir, table, ckpt, quarantine_dir=qdir)
    q.awaitTermination(300)
    v_applied = table.current_version()
    state_before = table.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)

    # a violating file: frames from segment 0 re-land (all below watermark)
    frames.filter("segment = 0 AND mtype <> 'R'").coalesce(1).write.mode(
        "append"
    ).parquet(frames_dir)
    seen = []
    q2 = pipeline.stream_ingest(
        spark, frames_dir, table, ckpt, quarantine_dir=qdir,
        on_batch=lambda m: seen.append(m),
    )
    q2.awaitTermination(300)
    assert seen and seen[-1]["late_frames"] > 0          # observable, not silent
    late = spark.read.parquet(qdir + "/late_frames")
    assert late.count() == seen[-1]["late_frames"]       # audit trail persisted
    state_after = table.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    assert state_after.equals(state_before)              # state untouched
    assert all(
        h["watermark_lsn"] <= table.watermark_lsn for h in table.history()
    ) and table.current_version() >= v_applied


def test_stream_mid_stream_relation_resend(spark, tmp_path):
    """An 'R' frame landing mid-stream (DDL) re-versions the relation for
    later micro-batches — the per-batch registry merge (last-Relation-wins,
    reference reader.py:222-243)."""
    import time

    RID = gen.RELATION_ID
    V0 = gen.RELATION_COLUMNS
    V1 = gen.RELATION_COLUMNS + ((0, "stars", 20, -1),)

    def cells5(repo, path, c, lang, content, content_cat="t"):
        return [("t", repo), ("t", path), ("t", c), ("t", lang),
                (content_cat, content if content_cat == "t" else None)]

    file1 = [
        (0, 1, "R", codec.encode_relation(RID, "public", "repo_files", "d", V0)),
        (0, 10, "B", codec.encode_begin(10, 1_000_000, 1)),
        (0, 11, "I", codec.encode_insert(RID, cells5("a", "p1", "c1", "py", "body1"))),
        (0, 13, "C", codec.encode_commit(12, 13, 1_000_000)),
    ]
    file2 = [
        (0, 20, "R", codec.encode_relation(RID, "public", "repo_files", "d", V1)),
        (0, 22, "B", codec.encode_begin(22, 2_000_000, 2)),
        (0, 23, "I", codec.encode_insert(
            RID, cells5("a", "p3", "c3", "py", "body3") + [("t", "5")])),
        (0, 24, "U", codec.encode_update(
            RID, cells5("a", "p1", "c1b", "py", None, content_cat="u") + [("t", "7")])),
        (0, 25, "C", codec.encode_commit(24, 25, 2_000_000)),
    ]
    frames_dir = str(tmp_path / "frames")
    for rows in (file1, file2):
        spark.createDataFrame(
            [(s, l, m, bytearray(pl)) for s, l, m, pl in rows],
            schema=gen.FRAMES_SCHEMA,
        ).coalesce(1).write.mode("append").parquet(frames_dir)
        time.sleep(1.1)  # distinct mod times → file source preserves order

    table = LakeTable.create(
        spark, str(tmp_path / "lake"),
        schema=[(c, "string") for c in gen.ALL_COLUMNS],
        key_cols=list(gen.KEY_COLUMNS), n_buckets=4,
    )
    q = pipeline.stream_ingest(
        spark, frames_dir, table, str(tmp_path / "ckpt"), max_files_per_trigger=1
    )
    q.awaitTermination(300)
    snap = table.snapshot()
    assert ["stars", "bigint"] in snap["schema"]
    rows = {(r["repo"], r["path"]): r for r in table.read().collect()}
    assert rows[("a", "p1")]["commit"] == "c1b"
    assert rows[("a", "p1")]["content"] == "body1"  # TOAST fallback to target
    assert rows[("a", "p1")]["stars"] == 7
    assert rows[("a", "p3")]["stars"] == 5


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


def test_project_relation_jsonb_variant(spark):
    """jsonb parity (reference reader.py:93-94, asserted parsed at
    tests/test_reader.py:203,223): with json_as_variant, jsonb OIDs
    project to Spark VARIANT — structured access without re-parsing."""
    reg = RelationRegistry()
    rv = reg.add_relation(1, codec.decode_message(codec.encode_relation(
        778, "public", "json_t", "d",
        [(1, "id", 23, -1), (0, "json_data", 3802, -1), (0, "doc", 114, -1)],
    )))
    frames = spark.createDataFrame(
        [
            (0, 5, "B", bytearray(codec.encode_begin(5, 1_000_000, 7))),
            (0, 6, "I", bytearray(codec.encode_insert(
                778, [("t", "1"),
                      ("t", '{"a": 5, "b": {"c": "x"}}'),
                      ("t", '[1, 2, 3]')]))),
            (0, 7, "I", bytearray(codec.encode_insert(
                778, [("t", "2"), ("t", "not json"), ("n", None)]))),
            (0, 8, "C", bytearray(codec.encode_commit(7, 8, 1_000_000))),
        ],
        schema=gen.FRAMES_SCHEMA,
    )
    raw = decode_op.decode_frames_raw(frames, reg)
    typed = decode_op.project_relation(raw, rv, typed=True, json_as_variant=True)
    assert "variant" in typed.schema["json_data"].dataType.simpleString()
    rows = {r["id"]: r for r in typed.selectExpr(
        "id",
        "variant_get(json_data, '$.a', 'int') AS a",
        "variant_get(json_data, '$.b.c', 'string') AS c",
        "variant_get(doc, '$[1]', 'int') AS second",
        "json_data IS NULL AS bad_json",
    ).collect()}
    assert rows[1]["a"] == 5 and rows[1]["c"] == "x" and rows[1]["second"] == 2
    assert rows[2]["bad_json"] is True  # malformed json → NULL, not a crash


def test_stream_restart_without_r_redelivery(spark, tmp_path):
    """Checkpoint restart: the file source never redelivers processed
    files, so the 'R' frames are gone from the stream — the registry must
    be seeded from a static read of frames_dir or DML-only batches are
    silently dropped while the checkpoint advances (ADVICE r2, high)."""
    p = gen.GenParams(n_txns=30, ops_per_txn=5, toast_pct=25, txns_per_segment=10)
    frames_dir = str(tmp_path / "frames")
    ckpt = str(tmp_path / "ckpt")
    frames = gen.spark_frames_df(spark, p)
    frames.filter("segment < 2").coalesce(1).write.mode("append").parquet(frames_dir)
    table = LakeTable.create(
        spark, str(tmp_path / "lake"),
        schema=[(c, "string") for c in gen.ALL_COLUMNS],
        key_cols=list(gen.KEY_COLUMNS), n_buckets=8,
    )
    q = pipeline.stream_ingest(spark, frames_dir, table, ckpt)
    q.awaitTermination(300)
    wm1 = table.watermark_lsn
    assert wm1 > 0

    # stream stopped; MORE DML-only files land (no R frames in them)
    frames.filter("segment >= 2").coalesce(1).write.mode("append").parquet(frames_dir)
    # fresh stream_ingest call, same checkpoint → only the new files replay
    batches = []
    q2 = pipeline.stream_ingest(
        spark, frames_dir, table, ckpt, on_batch=batches.append
    )
    q2.awaitTermination(300)
    assert table.watermark_lsn > wm1, "post-restart DML must merge"
    assert any(not m.get("skipped") for m in batches)
    got = (
        table.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    want = (
        duckdb.sql(gen.duckdb_final_state_sql(p, with_sha=False))
        .df().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert got[want.columns.tolist()].equals(want)


def test_project_relation_typed_reads_table_prop(spark, tmp_path):
    """project_relation_typed: json handling follows the TABLE property
    (default True — the reference parses json by default,
    reader.py:93-94); props json_as_variant=False keeps wire text."""
    reg = RelationRegistry()
    rv = reg.add_relation(1, codec.decode_message(codec.encode_relation(
        779, "public", "json_p", "d",
        [(1, "id", 23, -1), (0, "json_data", 3802, -1)],
    )))
    frames = spark.createDataFrame(
        [
            (0, 5, "B", bytearray(codec.encode_begin(5, 1_000_000, 7))),
            (0, 6, "I", bytearray(codec.encode_insert(
                779, [("t", "1"), ("t", '{"a": 5}')]))),
            (0, 7, "C", bytearray(codec.encode_commit(6, 7, 1_000_000))),
        ],
        schema=gen.FRAMES_SCHEMA,
    )
    raw = decode_op.decode_frames_raw(frames, reg)
    # no table → reference default: parsed
    t_default = decode_op.project_relation_typed(raw, rv)
    assert "variant" in t_default.schema["json_data"].dataType.simpleString()
    # table prop turns it off → wire text
    t_off = LakeTable.create(
        spark, str(tmp_path / "json_off"),
        schema=[("id", "int"), ("json_data", "string")], key_cols=["id"],
        props={"json_as_variant": False},
    )
    t_text = decode_op.project_relation_typed(raw, rv, table=t_off)
    assert t_text.schema["json_data"].dataType.simpleString() == "string"
    assert t_text.first()["json_data"] == '{"a": 5}'
    # table prop on → VARIANT
    t_on = LakeTable.create(
        spark, str(tmp_path / "json_on"),
        schema=[("id", "int"), ("json_data", "string")], key_cols=["id"],
        props={"json_as_variant": True},
    )
    t_var = decode_op.project_relation_typed(raw, rv, table=t_on)
    assert "variant" in t_var.schema["json_data"].dataType.simpleString()
    assert t_var.selectExpr(
        "variant_get(json_data, '$.a', 'int') AS a"
    ).first()["a"] == 5


def test_stream_ingest_clustered_no_shuffle(spark, tmp_path):
    """clustered=True (segment-aligned frame files) produces the same
    final state as the default path while skipping the per-batch
    repartition-by-segment shuffle, and late-replay counting rides the
    stats scan (no extra job) — the streaming hot-path configuration
    measured in tools/bench_streaming.py."""
    p = gen.GenParams(n_txns=60, ops_per_txn=6, toast_pct=30, txns_per_segment=10)
    frames_dir = str(tmp_path / "frames")
    frames = gen.spark_frames_df(spark, p)
    # one file per 2-segment chunk → every file holds whole segments
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
    seen = []
    q = pipeline.stream_ingest(
        spark, frames_dir, table, str(tmp_path / "ckpt"),
        max_files_per_trigger=1, clustered=True,
        on_batch=lambda m: seen.append(m),
    )
    q.awaitTermination(300)
    assert len(seen) >= 3 and all(not m.get("skipped") for m in seen)
    assert all(m["late_frames"] == 0 for m in seen)
    got = table.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    want = (
        duckdb.sql(gen.duckdb_final_state_sql(p, with_sha=False))
        .df().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert got[want.columns.tolist()].equals(want)


def test_stream_mixed_late_and_new_file(spark, tmp_path):
    """A violating file that STRADDLES the watermark (replayed frames from
    an applied segment + genuinely new frames) applies only the new rows:
    late rows are counted + quarantined per row, new rows merge, and the
    final state equals a clean full replay (the late_wm gating excludes
    late frames from every batch stat — watermark, truncate cohort, B/C
    transaction bounds — not just from the merge)."""
    p = gen.GenParams(n_txns=40, ops_per_txn=5, toast_pct=25, txns_per_segment=10)
    frames_dir = str(tmp_path / "frames")
    frames = gen.spark_frames_df(spark, p)
    frames.filter("segment < 2").coalesce(1).write.mode("append").parquet(frames_dir)
    table = LakeTable.create(
        spark, str(tmp_path / "lake"),
        schema=[(c, "string") for c in gen.ALL_COLUMNS],
        key_cols=list(gen.KEY_COLUMNS), n_buckets=8,
    )
    ckpt = str(tmp_path / "ckpt")
    qdir = str(tmp_path / "quarantine")
    q = pipeline.stream_ingest(spark, frames_dir, table, ckpt, quarantine_dir=qdir)
    q.awaitTermination(300)

    # one file mixing segment-1 replays (≤ watermark) with new segment-2+
    n_replay = frames.filter("segment = 1 AND mtype <> 'R'").count()
    frames.filter("(segment = 1 AND mtype <> 'R') OR segment >= 2").coalesce(
        1
    ).write.mode("append").parquet(frames_dir)
    seen = []
    q2 = pipeline.stream_ingest(
        spark, frames_dir, table, ckpt, quarantine_dir=qdir,
        on_batch=lambda m: seen.append(m),
    )
    q2.awaitTermination(300)
    assert seen and seen[-1]["late_frames"] == n_replay
    late = spark.read.parquet(qdir + "/late_frames")
    assert late.count() == n_replay
    got = table.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    want = (
        duckdb.sql(gen.duckdb_final_state_sql(p, with_sha=False))
        .df().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert got[want.columns.tolist()].equals(want)
