"""End-to-end CDC pipeline tests against an independent DuckDB oracle.

The oracle never touches the binary path: it regenerates the logical
event stream from the same deterministic SQL expressions and applies
serial reference semantics (LSN order, upsert/delete/truncate, TOAST-'u'
preserves current value). The Spark side goes the long way:
encode → binary pgoutput frames → repartition/decode → LWW → bucketed
merge → read the lake table back. Equality (incl. per-row content sha256)
proves the whole chain.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from pypgoutput_spark.lake.table import LakeTable
from pypgoutput_spark.operators import decode as decode_op
from pypgoutput_spark.plans.registry import RelationRegistry
from pypgoutput_spark.streaming import pipeline
from pypgoutput_spark.wal import generator as gen


def _final_state_spark(spark, table: LakeTable) -> pd.DataFrame:
    df = table.read().toPandas()
    return df.sort_values(["repo", "path"]).reset_index(drop=True)


def _final_state_oracle(p: gen.GenParams) -> pd.DataFrame:
    df = duckdb.sql(gen.duckdb_final_state_sql(p, with_sha=False)).df()
    return df.sort_values(["repo", "path"]).reset_index(drop=True)


def _assert_table_matches_oracle(spark, table, p, require_rows: bool = True):
    got = _final_state_spark(spark, table)
    want = _final_state_oracle(p)
    if require_rows:
        assert len(want) > 0
    assert len(got) == len(want), f"row count {len(got)} != oracle {len(want)}"
    got = got[want.columns.tolist()]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # per-row content sha256 equality (BASELINE.json input_hint invariant)
    import hashlib

    def sha(s):
        return None if s is None else hashlib.sha256(s.encode()).hexdigest()

    assert [sha(x) for x in got["content"].where(got["content"].notna(), None)] == [
        sha(x) for x in want["content"].where(want["content"].notna(), None)
    ]


def _mk_table(spark, tmp_path, n_buckets=8) -> LakeTable:
    return LakeTable.create(
        spark,
        str(tmp_path / "lake"),
        schema=[(c, "string") for c in gen.ALL_COLUMNS],
        key_cols=list(gen.KEY_COLUMNS),
        n_buckets=n_buckets,
    )


P_BASE = gen.GenParams(n_txns=120, ops_per_txn=6, n_repos=40, n_paths=25,
                       toast_pct=30, txns_per_segment=10)


def test_decode_roundtrip_events(spark):
    """encode → binary → decode reproduces the logical stream exactly."""
    p = gen.GenParams(n_txns=30, ops_per_txn=5, txns_per_segment=7)
    frames = gen.spark_frames_df(spark, p)
    events = decode_op.decode_frames(frames).filter("op != 'T'")
    got = (
        events.selectExpr(
            "lsn", "op", "after['repo'] AS repo", "after['path'] AS path",
            "after['commit'] AS commit", "after['lang'] AS lang",
            "after['content'] AS content",
            "array_contains(coalesce(after_unchanged, array()), 'content') AS content_unchanged",
            "xid", "begin_lsn",
        )
        .toPandas()
        .sort_values("lsn")
        .reset_index(drop=True)
    )
    want = (
        gen.spark_events_df(spark, p)
        .filter("op != 'T'")
        .toPandas()
        .sort_values("lsn")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    # D events: decoded 'after' is null; compare I/U value columns only there
    for col in ("lsn", "op"):
        assert got[col].tolist() == want[col].tolist()
    iu = want.op.isin(["I", "U"]).values
    for col in ("repo", "path", "commit", "lang"):
        assert got.loc[iu, col].tolist() == want.loc[iu, col].tolist()
    # content: wire carries None for TOAST-'u' cells, value otherwise
    exp_content = want.loc[iu].apply(
        lambda r: None if r.content_unchanged else r.content, axis=1
    )
    assert got.loc[iu, "content"].where(got.loc[iu, "content"].notna(), None).tolist() == \
        exp_content.where(exp_content.notna(), None).tolist()
    assert got.loc[iu, "content_unchanged"].tolist() == want.loc[iu, "content_unchanged"].tolist()
    # transaction stamping: xid = 1000 + txn for every event
    txn = (want["lsn"] - 10) // p.lsn_stride
    assert got["xid"].tolist() == (1000 + txn).tolist()
    assert got["begin_lsn"].tolist() == (10 + txn * p.lsn_stride).tolist()
    # D events carry the key in before
    d_events = decode_op.decode_frames(frames).filter("op = 'D'")
    row = d_events.selectExpr("before['repo']", "before_kind").first()
    if row is not None:
        assert row[0] is not None and row[1] == "K"


def test_e2e_single_batch(spark, tmp_path):
    table = _mk_table(spark, tmp_path)
    frames = gen.spark_frames_df(spark, P_BASE)
    metrics = pipeline.run_ingest(spark, frames, table)
    assert len(metrics) == 1 and not metrics[0]["skipped"]
    _assert_table_matches_oracle(spark, table, P_BASE)


def test_e2e_multi_batch_incremental(spark, tmp_path):
    """Multiple micro-batches: TOAST fallback must read values merged by
    earlier batches from the target table."""
    table = _mk_table(spark, tmp_path)
    frames = gen.spark_frames_df(spark, P_BASE)
    metrics = pipeline.run_ingest(spark, frames, table, n_batches=4)
    assert len(metrics) == 4
    _assert_table_matches_oracle(spark, table, P_BASE)
    # watermark advanced monotonically and is committed with the data
    hist = table.history()
    wms = [h["watermark_lsn"] for h in hist]
    assert wms == sorted(wms)


def test_e2e_with_truncates(spark, tmp_path):
    p = gen.GenParams(n_txns=90, ops_per_txn=6, n_repos=30, n_paths=20,
                      toast_pct=30, truncate_every=25, txns_per_segment=9)
    table = _mk_table(spark, tmp_path)
    frames = gen.spark_frames_df(spark, p)
    pipeline.run_ingest(spark, frames, table, n_batches=3)
    _assert_table_matches_oracle(spark, table, p)


def test_e2e_key_change_updates(spark, tmp_path):
    """UPDATEs that change the key (repo,path): the 'K' before-image key
    must be deleted and the new key upserted (reference emits the old key
    in the before image, tests/test_reader.py:231-251; serial replay =
    delete old + insert new)."""
    p = gen.GenParams(n_txns=100, ops_per_txn=6, n_repos=30, n_paths=20,
                      toast_pct=30, txns_per_segment=10, key_change_pct=25)
    table = _mk_table(spark, tmp_path)
    frames = gen.spark_frames_df(spark, p)
    # sanity: the stream really carries K old images on U frames
    from pypgoutput_spark.operators import decode as dop
    k_updates = (
        dop.decode_frames_raw(frames)
        .filter("op = 'U' AND before_kind = 'K'").count()
    )
    assert k_updates > 0
    # the independent toast draw means some key-changes carry
    # unchanged-TOAST content → enable the bounded-pass resolver
    pipeline.run_ingest(spark, frames, table, n_batches=2, kc_toast_passes=4)
    _assert_table_matches_oracle(spark, table, p)


def test_e2e_salted_lww(spark, tmp_path):
    table = _mk_table(spark, tmp_path)
    frames = gen.spark_frames_df(spark, P_BASE)
    pipeline.run_ingest(spark, frames, table, salt_buckets=4)
    _assert_table_matches_oracle(spark, table, P_BASE)


def test_resume_from_checkpoint_and_idempotent_replay(spark, tmp_path):
    """Apply first half, then re-run the FULL stream: already-applied
    frames are skipped via the watermark; final state identical."""
    p = P_BASE
    table = _mk_table(spark, tmp_path)
    frames = gen.spark_frames_df(spark, p)
    half = frames.filter(f"segment < {p.n_txns // p.txns_per_segment // 2}")
    pipeline.run_ingest(spark, half, table)
    wm_half = table.watermark_lsn
    assert wm_half > 0
    # full replay from the beginning — resume must skip ≤ watermark
    pipeline.run_ingest(spark, frames, table, n_batches=3)
    _assert_table_matches_oracle(spark, table, p)
    # replay the whole stream again — pure no-op (exactly-once)
    v_before = table.current_version()
    metrics = pipeline.run_ingest(spark, frames, table)
    assert metrics[0]["skipped"] is True
    assert table.current_version() == v_before


def test_time_travel_and_metrics(spark, tmp_path):
    table = _mk_table(spark, tmp_path)
    frames = gen.spark_frames_df(spark, P_BASE)
    pipeline.run_ingest(spark, frames, table, n_batches=2)
    hist = table.history()
    assert len(hist) == 3  # create + 2 merges
    m = hist[-1]["metrics"]
    assert m["upserts"] >= 0 and "buckets_touched" in m and "deletes" in m
    # time travel: v1 state differs from v2 state
    v1 = table.read(version=1).count()
    v2 = table.read(version=2).count()
    assert v1 > 0 and v2 > 0


def test_schema_evolution_add_drop(spark, tmp_path):
    """Relation re-send with a new column → registry diff → metadata-only
    evolution; old files read as NULL for the new column."""
    table = _mk_table(spark, tmp_path)
    frames = gen.spark_frames_df(spark, P_BASE)
    pipeline.run_ingest(spark, frames, table)
    reg = RelationRegistry()
    from pypgoutput_spark.wal import codec

    v0 = reg.add_relation(1, codec.decode_message(codec.encode_relation(
        gen.RELATION_ID, "public", "repo_files", "d", gen.RELATION_COLUMNS)))
    new_cols = gen.RELATION_COLUMNS + ((0, "stars", 20, -1),)
    v1 = reg.add_relation(10_000_000, codec.decode_message(codec.encode_relation(
        gen.RELATION_ID, "public", "repo_files", "d", new_cols)))
    actions = RelationRegistry.diff(v0, v1)
    assert [a.kind for a in actions] == ["add"]
    before_rows = table.read().count()
    table.evolve_schema(actions)
    snap = table.snapshot()
    assert ["stars", "bigint"] in snap["schema"]
    df = table.read()
    assert df.count() == before_rows
    assert df.filter("stars IS NULL").count() == before_rows  # old files → NULL
    # drop it again
    drop = RelationRegistry.diff(v1, v0)
    assert [a.kind for a in drop] == ["drop"]
    table.evolve_schema(drop)
    assert "stars" not in [c[0] for c in table.snapshot()["schema"]]
    assert table.read().count() == before_rows
