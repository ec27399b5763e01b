"""Dead-letter repair (streaming/repair.py): quarantine → replay → exact.

Scenario: the transport delivers a stream with corrupted DML payloads;
non-strict ingest quarantines them (op='E') and applies the rest, so the
table diverges from the oracle. The frames are then re-fetched intact
and ``replay_quarantine`` folds the lost changes back — the final state
must equal the serial oracle EXACTLY (late deletes, TOAST carriers and
all), the watermark must not move, and a second replay must be a ledger
no-op.
"""

from __future__ import annotations

import dataclasses

import duckdb
import pandas as pd
import pytest

from pypgoutput_spark.lake.table import LakeTable
from pypgoutput_spark.streaming import pipeline
from pypgoutput_spark.streaming.repair import replay_quarantine
from pypgoutput_spark.wal import generator as gen

P = gen.GenParams(
    n_txns=60, ops_per_txn=6, n_repos=15, n_paths=10,
    toast_pct=30, txns_per_segment=10,
)


def _corrupt(frames_pdf: pd.DataFrame) -> tuple[pd.DataFrame, list[int]]:
    """Truncate every 7th DML payload — undecodable, structure intact."""
    bad = frames_pdf[frames_pdf.mtype.isin(("I", "U", "D"))].iloc[::7]
    out = frames_pdf.copy()
    out.loc[bad.index, "payload"] = out.loc[bad.index, "payload"].map(
        lambda b: bytes(b)[:2]
    )
    return out, sorted(int(x) for x in bad.lsn)


def _mk_table(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / "lake"),
        schema=[(c, "string") for c in gen.ALL_COLUMNS],
        key_cols=list(gen.KEY_COLUMNS), n_buckets=8,
    )


def _state(spark, table):
    return (table.read().toPandas()
            .sort_values(["repo", "path"]).reset_index(drop=True))


def _oracle():
    return (duckdb.sql(gen.duckdb_final_state_sql(P, with_sha=False)).df()
            .sort_values(["repo", "path"]).reset_index(drop=True))


def test_replay_quarantine_restores_exact_state(spark, tmp_path):
    good = gen.spark_frames_df(spark, P)
    pdf = good.toPandas()
    bad_pdf, bad_lsns = _corrupt(pdf)
    assert len(bad_lsns) >= 20
    corrupted = spark.createDataFrame(bad_pdf, good.schema)

    table = _mk_table(spark, tmp_path)
    qdir = str(tmp_path / "quarantine")
    pipeline.run_ingest(
        spark, corrupted, table, n_batches=2, strict=False,
        quarantine_dir=qdir,
    )
    wm = table.watermark_lsn
    assert wm > 0

    q = spark.read.parquet(qdir)
    assert sorted(r["lsn"] for r in q.select("lsn").collect()) == bad_lsns
    # the damage is real: the table diverged from the oracle
    want = _oracle()
    got = _state(spark, table)
    assert not got.equals(want[got.columns.tolist()].reset_index(drop=True))

    rep = replay_quarantine(spark, good, table, qdir)
    assert rep["repaired"] == len(bad_lsns)
    assert rep["repair"] is True
    assert table.watermark_lsn == wm  # repair never acks new LSNs

    got = _state(spark, table)
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)

    # second replay: everything ledgered, pure no-op
    rep2 = replay_quarantine(spark, good, table, qdir)
    assert rep2 == {"skipped": True, "reason": "nothing-pending", "repaired": 0}


def test_replay_strict_raises_if_still_corrupt(spark, tmp_path):
    good = gen.spark_frames_df(spark, P)
    bad_pdf, _ = _corrupt(good.toPandas())
    corrupted = spark.createDataFrame(bad_pdf, good.schema)

    table = _mk_table(spark, tmp_path)
    qdir = str(tmp_path / "quarantine")
    pipeline.run_ingest(
        spark, corrupted, table, n_batches=1, strict=False,
        quarantine_dir=qdir,
    )
    # replaying the SAME corrupt frames under the default strict contract
    # must fail loudly, and must NOT ledger anything as repaired
    with pytest.raises(Exception):
        replay_quarantine(spark, corrupted, table, qdir)
    rep = replay_quarantine(spark, good, table, qdir)
    assert rep["repaired"] > 0
    pd.testing.assert_frame_equal(
        _state(spark, table)[_oracle().columns.tolist()], _oracle(),
        check_dtype=False,
    )


P_MULTI = gen.GenParams(
    n_txns=60, ops_per_txn=6, n_repos=15, n_paths=10,
    toast_pct=30, txns_per_segment=10, n_relations=2,
)

P_KC = gen.GenParams(
    n_txns=60, ops_per_txn=6, n_repos=15, n_paths=10,
    toast_pct=30, txns_per_segment=10, key_change_pct=25,
)


def test_replay_quarantine_multi_relation(spark, tmp_path):
    """Repair routes per relation: one quarantine dir, two tables, each
    restored to ITS oracle state by a single replay call."""
    good = gen.spark_frames_df(spark, P_MULTI)
    bad_pdf, bad_lsns = _corrupt(good.toPandas())
    corrupted = spark.createDataFrame(bad_pdf, good.schema)

    tables = {
        gen.RELATION_ID + r: LakeTable.create(
            spark, str(tmp_path / f"lake_{r}"),
            schema=[(c, "string") for c in gen.ALL_COLUMNS],
            key_cols=list(gen.KEY_COLUMNS), n_buckets=8,
        )
        for r in range(2)
    }
    qdir = str(tmp_path / "quarantine")
    pipeline.run_ingest(spark, corrupted, tables, n_batches=2,
                        strict=False, quarantine_dir=qdir)
    wms = {rid: t.watermark_lsn for rid, t in tables.items()}

    rep = replay_quarantine(spark, good, tables, qdir)
    assert rep["repaired"] == len(bad_lsns)
    assert set(rep["relations"]) == set(tables)

    want_by_rid = duckdb.sql(
        gen.duckdb_final_state_sql(P_MULTI, with_sha=False, with_relation=True)
    ).df()
    for rid, table in tables.items():
        assert table.watermark_lsn == wms[rid]
        want = (want_by_rid[want_by_rid.relation_id == rid]
                .drop(columns=["relation_id"])
                .sort_values(["repo", "path"]).reset_index(drop=True))
        got = (table.read().toPandas()
               .sort_values(["repo", "path"]).reset_index(drop=True))
        assert len(got) == len(want) > 0, f"rid={rid}"
        pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                      check_dtype=False)


def test_replay_quarantine_key_change_toast(spark, tmp_path):
    """Repair over a stream with key-change UPDATEs (some carrying
    TOAST-'u' cells): a quarantined key-change event affects BOTH its
    old and new key — the explode-before-affected-keys rule — and the
    kc_toast resolver runs inside the repair window too."""
    good = gen.spark_frames_df(spark, P_KC)
    bad_pdf, bad_lsns = _corrupt(good.toPandas())
    corrupted = spark.createDataFrame(bad_pdf, good.schema)

    table = _mk_table(spark, tmp_path)
    qdir = str(tmp_path / "quarantine")
    pipeline.run_ingest(spark, corrupted, table, n_batches=2, strict=False,
                        quarantine_dir=qdir, kc_toast_passes=4)
    wm = table.watermark_lsn

    rep = replay_quarantine(spark, good, table, qdir, kc_toast_passes=4)
    assert rep["repaired"] == len(bad_lsns)
    assert table.watermark_lsn == wm

    want = (duckdb.sql(gen.duckdb_final_state_sql(P_KC, with_sha=False)).df()
            .sort_values(["repo", "path"]).reset_index(drop=True))
    got = (table.read().toPandas()
           .sort_values(["repo", "path"]).reset_index(drop=True))
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)


def test_replay_quarantine_streamed_with_spill(spark, tmp_path):
    """Repair over a protocol-v2 streamed WAL with the ingest run's
    bounded-memory spill threshold passed through: the repair window
    re-decodes the same frames, so a streamed transaction that needed
    the spill during ingest needs it during repair too (1-byte
    threshold → every stream group takes the spool-file path on both
    legs), and the repaired table still lands the exact oracle state."""
    p_s = dataclasses.replace(P, stream_pct=60, stream_abort_pct=0)
    good = gen.spark_frames_df(spark, p_s)
    bad_pdf, bad_lsns = _corrupt(good.toPandas())
    corrupted = spark.createDataFrame(bad_pdf, good.schema)

    table = _mk_table(spark, tmp_path)
    qdir = str(tmp_path / "quarantine")
    pipeline.run_ingest(spark, corrupted, table, n_batches=2, strict=False,
                        quarantine_dir=qdir, stream_spill_bytes=1)
    wm = table.watermark_lsn
    assert wm > 0

    rep = replay_quarantine(spark, good, table, qdir, stream_spill_bytes=1)
    assert rep["repaired"] == len(bad_lsns)
    assert table.watermark_lsn == wm

    want = (duckdb.sql(gen.duckdb_final_state_sql(p_s, with_sha=False)).df()
            .sort_values(["repo", "path"]).reset_index(drop=True))
    got = _state(spark, table)
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)
