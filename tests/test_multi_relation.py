"""Multi-relation routing, relation-scoped truncate, and cross-batch
open-transaction state.

Reference parity targets:
  - any number of relations interleaved in one stream, dispatched by
    relation_id (reference reader.py:124-132, 252-258);
  - transaction scope surviving arbitrary message boundaries
    (reader.py:182-193) — here: micro-batch cuts that fall inside a
    transaction, including across a process restart (state is persisted
    in the snapshot commit).
"""

from __future__ import annotations

import duckdb
import pytest

from pypgoutput_spark.lake.table import LakeTable
from pypgoutput_spark.operators import decode as decode_op
from pypgoutput_spark.plans.registry import RelationRegistry
from pypgoutput_spark.streaming import pipeline
from pypgoutput_spark.wal import generator as gen


def _mk_tables(spark, tmp_path, n: int):
    return {
        gen.RELATION_ID + r: LakeTable.create(
            spark, str(tmp_path / f"lake_{r}"),
            schema=[(c, "string") for c in gen.ALL_COLUMNS],
            key_cols=list(gen.KEY_COLUMNS), n_buckets=8,
        )
        for r in range(n)
    }


def _oracle_by_relation(p: gen.GenParams):
    df = duckdb.sql(
        gen.duckdb_final_state_sql(p, with_sha=False, with_relation=True)
    ).df()
    return {
        rid: g.drop(columns=["relation_id"])
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
        for rid, g in df.groupby("relation_id")
    }


def _assert_tables_match(tables, oracles):
    for rid, table in tables.items():
        got = (
            table.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
        )
        want = oracles.get(rid)
        assert want is not None and len(want) > 0
        assert len(got) == len(want), f"rid={rid}: {len(got)} != {len(want)}"
        assert got[want.columns.tolist()].equals(want), f"rid={rid} mismatch"


P_MULTI = gen.GenParams(
    n_txns=100, ops_per_txn=6, n_repos=30, n_paths=20,
    toast_pct=30, txns_per_segment=10, n_relations=2,
)


def test_multi_relation_routing(spark, tmp_path):
    """Interleaved two-relation stream → each table matches its own oracle."""
    tables = _mk_tables(spark, tmp_path, 2)
    frames = gen.spark_frames_df(spark, P_MULTI)
    metrics = pipeline.run_ingest(spark, frames, tables, n_batches=2)
    assert all(not m["skipped"] for m in metrics)
    assert set(metrics[0]["relations"]) == set(tables)
    _assert_tables_match(tables, _oracle_by_relation(P_MULTI))


def test_relation_scoped_truncate(spark, tmp_path):
    """A Truncate for relation A must not wipe relation B (relation-id
    list parsed from the T frame, not a frame-level barrier)."""
    p = gen.GenParams(
        n_txns=90, ops_per_txn=6, n_repos=25, n_paths=18,
        toast_pct=25, truncate_every=20, txns_per_segment=9, n_relations=2,
    )
    tables = _mk_tables(spark, tmp_path, 2)
    frames = gen.spark_frames_df(spark, p)
    # sanity: the stream actually contains truncates for both relations
    assert frames.filter("mtype = 'T'").count() > 0
    pipeline.run_ingest(spark, frames, tables, n_batches=3)
    _assert_tables_match(tables, _oracle_by_relation(p))


def test_open_tx_carry_mid_transaction_cut(spark):
    """Batch cut inside a transaction: the carry captures the open B and
    the next batch's decode stamps (xid, begin_lsn, commit_ts) exactly."""
    p = gen.GenParams(n_txns=6, ops_per_txn=5, txns_per_segment=3)
    frames = gen.spark_frames_df(spark, p)
    # txn t occupies lsns [10 + 7t, 16 + 7t]; cut at 27 → inside txn 2
    cut = 27
    txn = (cut - 10) // p.lsn_stride
    assert 10 + txn * p.lsn_stride < cut <= 16 + txn * p.lsn_stride
    b1 = frames.filter(f"lsn < {cut}")
    b2 = frames.filter(f"lsn >= {cut}")
    reg = RelationRegistry.from_frames(frames)

    carry = pipeline.open_tx_carry(b1)
    seg = txn // p.txns_per_segment
    assert carry == {seg: (1000 + txn, 10 + txn * p.lsn_stride, txn * 1_000_000)}

    # without the carry the straddling events lose their transaction scope
    bare = decode_op.decode_frames_raw(b2, reg).filter(f"lsn < {10 + (txn + 1) * p.lsn_stride}")
    assert all(r["xid"] is None for r in bare.select("xid").collect())
    # with it, stamping is exact for the straddled span and beyond
    carried = decode_op.decode_frames_raw(b2, reg, open_tx=carry)
    rows = carried.select("lsn", "xid", "begin_lsn").collect()
    for r in rows:
        t = (r["lsn"] - 10) // p.lsn_stride
        assert r["xid"] == 1000 + t, f"lsn={r['lsn']}"
        assert r["begin_lsn"] == 10 + t * p.lsn_stride

    # carry-out of the second batch is empty (stream ends on a commit)
    assert pipeline.open_tx_carry(b2, carry) == {}


def test_lsn_split_ingest_and_resume_mid_transaction(spark, tmp_path):
    """run_ingest(split='lsn') cuts mid-transaction; final state still
    matches, and a restart between batches restores the open-transaction
    state from the snapshot commit."""
    p = gen.GenParams(n_txns=80, ops_per_txn=7, n_repos=25, n_paths=18,
                      toast_pct=30, txns_per_segment=8)
    table = LakeTable.create(
        spark, str(tmp_path / "lake"),
        schema=[(c, "string") for c in gen.ALL_COLUMNS],
        key_cols=list(gen.KEY_COLUMNS), n_buckets=8,
    )
    frames = gen.spark_frames_df(spark, p)
    metrics = pipeline.run_ingest(spark, frames, table, n_batches=5, split="lsn")
    assert len(metrics) == 5
    # at least one cut fell inside a transaction (carry non-empty)
    assert any(m["open_tx"] for m in metrics[:-1])
    got = table.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    want = (
        duckdb.sql(gen.duckdb_final_state_sql(p, with_sha=False))
        .df().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    assert len(got) == len(want) and got[want.columns.tolist()].equals(want)

    # restart scenario: apply only a prefix that ends mid-transaction,
    # then resume with a fresh run (state read back from the snapshot)
    table2 = LakeTable.create(
        spark, str(tmp_path / "lake2"),
        schema=[(c, "string") for c in gen.ALL_COLUMNS],
        key_cols=list(gen.KEY_COLUMNS), n_buckets=8,
    )
    cut = 10 + 11 * p.lsn_stride + 3  # inside txn 11
    pipeline.run_ingest(spark, frames.filter(f"lsn < {cut}"), table2)
    stored = pipeline.stored_open_tx(table2)
    assert stored == {11 // p.txns_per_segment: (1011, 10 + 11 * p.lsn_stride, 11_000_000)}
    pipeline.run_ingest(spark, frames, table2, n_batches=2)  # resume skips < cut
    got2 = table2.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    assert len(got2) == len(want) and got2[want.columns.tolist()].equals(want)


def test_dead_letter_quarantine(spark, tmp_path):
    """strict=False: corrupt frames are counted and quarantined, good
    frames still apply (the observable dead-letter path, vs the
    reference's tear-down-on-error reader.py:326-331)."""
    p = gen.GenParams(n_txns=20, ops_per_txn=5, txns_per_segment=5)
    frames = gen.spark_frames_df(spark, p)
    corrupt = spark.createDataFrame(
        [(0, 7, "I", bytearray(b"I\x00\x00\xc8\x22Nxx"))],  # truncated insert
        schema=gen.FRAMES_SCHEMA,
    )
    table = LakeTable.create(
        spark, str(tmp_path / "lake"),
        schema=[(c, "string") for c in gen.ALL_COLUMNS],
        key_cols=list(gen.KEY_COLUMNS), n_buckets=8,
    )
    qdir = str(tmp_path / "quarantine")
    metrics = pipeline.apply_frames_batch(
        table, frames.unionByName(corrupt), strict=False, quarantine_dir=qdir,
    )
    assert metrics["dead_letters"] == 1
    qdf = spark.read.parquet(qdir)
    assert qdf.count() == 1 and qdf.first()["lsn"] == 7
    assert "error" in qdf.columns
    # the good stream still merged to the oracle state
    got = table.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    want = (
        duckdb.sql(gen.duckdb_final_state_sql(p, with_sha=False))
        .df().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    assert len(got) == len(want) and got[want.columns.tolist()].equals(want)


def test_strict_raises_on_unknown_relation(spark, tmp_path):
    """strict=True keeps the reference's fail-fast contract."""
    frames = gen.spark_frames_df(spark, gen.GenParams(n_txns=4, ops_per_txn=3))
    no_r = frames.filter("mtype <> 'R'")
    table = LakeTable.create(
        spark, str(tmp_path / "lake"),
        schema=[(c, "string") for c in gen.ALL_COLUMNS],
        key_cols=list(gen.KEY_COLUMNS), n_buckets=4,
    )
    metrics = pipeline.apply_frames_batch(table, no_r)
    assert metrics["skipped"] and metrics["reason"] == "no-relation"
    # with a registry but an event for an unregistered relation → decode raises
    from pypgoutput_spark.wal import codec

    reg = RelationRegistry.from_frames(frames)
    stray = spark.createDataFrame(
        [(0, 999, "I", bytearray(codec.encode_insert(
            gen.RELATION_ID + 7, [("t", "r"), ("t", "p"), ("n", None), ("n", None), ("n", None)]
        )))],
        schema=gen.FRAMES_SCHEMA,
    )
    with pytest.raises(Exception, match="no Relation message"):
        decode_op.decode_frames_raw(stray, reg).collect()


def test_unmanaged_relation_counted_not_silent(spark, tmp_path):
    """A relation present in the stream (with an 'R' schema) but with no
    managed table is dropped from the merge — but its event count is
    surfaced in the batch metrics (ADVICE r2: never silently lost)."""
    p = gen.GenParams(n_txns=8, ops_per_txn=4, n_relations=2, txns_per_segment=4)
    frames = gen.spark_frames_df(spark, p)
    table = LakeTable.create(
        spark, str(tmp_path / "lake"),
        schema=[(c, "string") for c in gen.ALL_COLUMNS],
        key_cols=list(gen.KEY_COLUMNS), n_buckets=4,
    )
    # manage only relation 0; relation 1's events must be counted
    metrics = pipeline.apply_frames_batch(
        {gen.RELATION_ID: table}, frames
    )
    assert not metrics["skipped"]
    unmanaged = metrics.get("unmanaged_relations", {})
    assert gen.RELATION_ID + 1 in unmanaged
    assert unmanaged[gen.RELATION_ID + 1] > 0
