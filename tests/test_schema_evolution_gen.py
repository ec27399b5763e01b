"""Generator-driven schema evolution (the CORRECTNESS entry's machinery):
``GenParams.evolve_at_txn`` re-sends the Relation with a trailing BIGINT
``stars`` column mid-stream and encodes 6-cell tuples from there on; the
serial DuckDB oracle replays the same stream. Complements
test_schema_evolution_stream.py (hand-built frames) with the synthetic
full-pipeline shapes the driver gate runs at scale."""

from __future__ import annotations

import pytest

from pypgoutput_spark.operators import decode as decode_op
from pypgoutput_spark.streaming import pipeline
from pypgoutput_spark.wal import generator as gen
from tests.test_pipeline import _assert_table_matches_oracle, _mk_table


def _ingest(spark, tmp_path, p, n_batches=2):
    table = _mk_table(spark, tmp_path)
    pipeline.run_ingest(spark, gen.spark_frames_df(spark, p), table,
                        n_batches=n_batches)
    return table


def test_evolve_null_alignment_matches_oracle(spark, tmp_path):
    p = gen.GenParams(n_txns=60, ops_per_txn=6, n_repos=30, n_paths=20,
                      toast_pct=30, txns_per_segment=10, evolve_at_txn=30)
    table = _ingest(spark, tmp_path, p)
    snap = table.snapshot()
    assert ["stars", "bigint"] in snap["schema"]
    _assert_table_matches_oracle(spark, table, p)
    stars = table.read().toPandas()["stars"]
    # rows last written before the boundary are NULL-aligned; rows
    # written after carry the typed value — both regimes must survive
    assert stars.isna().any() and stars.notna().any()


def test_evolve_with_post_boundary_truncate(spark, tmp_path):
    # truncates at txns 0/25/50 straddle the boundary at 30: the decoder
    # must version the post-boundary 'T' under v2 and the final state is
    # post-truncate rows only (all evolved)
    p = gen.GenParams(n_txns=60, ops_per_txn=6, n_repos=30, n_paths=20,
                      toast_pct=30, truncate_every=25, txns_per_segment=10,
                      evolve_at_txn=30)
    table = _ingest(spark, tmp_path, p)
    _assert_table_matches_oracle(spark, table, p)
    stars = table.read().toPandas()["stars"]
    assert stars.notna().all(), "post-truncate rows all post-evolution"


def test_evolve_frame_grammar_and_registry_versions(spark):
    p = gen.GenParams(n_txns=20, ops_per_txn=4, n_repos=10, n_paths=8,
                      txns_per_segment=10, evolve_at_txn=10)
    frames = gen.spark_frames_df(spark, p)
    raw = decode_op.decode_frames_raw(frames).toPandas()
    dml = raw[raw.op.isin(["I", "U"])]
    boundary_lsn = 10 + p.evolve_at_txn * p.lsn_stride
    pre = dml[dml.lsn < boundary_lsn]
    post = dml[dml.lsn >= boundary_lsn]
    assert len(pre) and len(post)
    assert {len(v) for v in pre.new_vals} == {5}
    assert {len(v) for v in post.new_vals} == {6}
    assert set(pre.schema_version) != set(post.schema_version)
    # the evolved cell is the deterministic stars draw, never absent
    assert all(v[5] is not None for v in post.new_vals)


def test_evolve_lands_with_its_batch_not_eagerly(spark, tmp_path):
    """Version pruning by batch LSN span: the batch-mode registry knows
    the whole stream's future, but the table must evolve with the batch
    that CARRIES the DDL — and batches wholly on one side of it must
    run the single-projection plan (their schema snapshot is the pin;
    the perf effect is the unstaged single-pass decode)."""
    p = gen.GenParams(n_txns=60, ops_per_txn=6, n_repos=30, n_paths=20,
                      toast_pct=30, txns_per_segment=10, evolve_at_txn=30)
    table = _mk_table(spark, tmp_path)
    schemas = []
    pipeline.run_ingest(
        spark, gen.spark_frames_df(spark, p), table, n_batches=3,
        on_batch=lambda m: schemas.append(
            [c for c, _t in table.snapshot()["schema"]]
        ),
    )
    # 6 segments / 3 batches; boundary at txn 30 = segment 3 = batch 2
    assert "stars" not in schemas[0], "batch 1 is wholly pre-DDL"
    assert "stars" in schemas[1] and "stars" in schemas[2]
    _assert_table_matches_oracle(spark, table, p)


def test_replayed_pre_ddl_batch_never_downgrades_schema(spark, tmp_path):
    """At-least-once redelivery of a PRE-DDL span to an already-evolved
    table must not align the table back to the old version: the batch's
    newest LIVE version is the 5-column schema, and evolving to it
    would DROP the stars column and its data. The watermark guard skips
    both the evolve and (as always) the merge."""
    from pypgoutput_spark.plans.registry import RelationRegistry

    p = gen.GenParams(n_txns=60, ops_per_txn=6, n_repos=30, n_paths=20,
                      toast_pct=30, txns_per_segment=10, evolve_at_txn=30)
    table = _ingest(spark, tmp_path, p)
    cols = [c for c, _t in table.snapshot()["schema"]]
    assert "stars" in cols
    before = (
        table.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    assert before["stars"].notna().any()

    frames = gen.spark_frames_df(spark, p)
    early = frames.filter(f"lsn < {10 + p.evolve_at_txn * p.lsn_stride}")
    reg = RelationRegistry.from_frames(early)
    m = pipeline.apply_frames_batch(table, early, reg)
    assert m.get("skipped") or m["relations"][gen.RELATION_ID].get("skipped")
    assert "stars" in [c for c, _t in table.snapshot()["schema"]], (
        "replayed pre-DDL batch downgraded the schema"
    )
    after = (
        table.read().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(before, after)


def test_evolve_rejects_streamed_combo():
    with pytest.raises(ValueError, match="evolve_at_txn"):
        gen.GenParams(n_txns=20, stream_pct=40, evolve_at_txn=10,
                      txns_per_segment=10)
