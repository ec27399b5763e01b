"""Round-6 optimization pins: the fused LWW-collapse + bucket-placement
merge path (one exchange per merge instead of two) and the whole-ingest
prescan must not change WHAT the pipeline computes — only how many
jobs/shuffles it runs.
"""

import tempfile

import pytest
from pyspark.sql import functions as F

from pypgoutput_spark.lake.table import LakeTable, _bucket_col
from pypgoutput_spark.operators import decode as decode_op
from pypgoutput_spark.operators.lww import lww_changes_flat
from pypgoutput_spark.plans.registry import RelationRegistry
from pypgoutput_spark.streaming import pipeline
from pypgoutput_spark.streaming.pipeline import (
    _explode_key_changes,
    project_all_versions,
)
from pypgoutput_spark.wal import generator as gen

BASE_COLS = ["lsn", "op", "xid", "begin_lsn", "commit_ts_us"]


@pytest.fixture(scope="module")
def staged(spark, tmp_path_factory):
    p = gen.GenParams(n_txns=60, ops_per_txn=6, txns_per_segment=10,
                      toast_pct=30)
    root = tmp_path_factory.mktemp("fused")
    gen.spark_frames_df(spark, p).write.parquet(str(root / "frames"))
    frames = spark.read.parquet(str(root / "frames"))
    reg = RelationRegistry.from_frames(frames)
    raw = decode_op.decode_frames_raw(frames, reg, strict=True, clustered=True)
    keys = list(gen.KEY_COLUMNS)
    vals = [c for c in gen.ALL_COLUMNS if c not in keys]
    proj = _explode_key_changes(
        project_all_versions(raw, reg, gen.RELATION_ID, keys, vals, BASE_COLS),
        keys, vals, BASE_COLS, guard_kc_toast=True,
    )
    return frames, proj, keys, vals, p, root


def _n_exchanges(df) -> int:
    return df._jdf.queryExecution().executedPlan().toString().count("Exchange")


def test_fused_lww_single_exchange_same_rows(staged):
    """bucket_expr grouping adds _bucket, keeps exactly one Exchange in
    the collapse, and resolves identical rows to the plain collapse."""
    _frames, proj, keys, vals, _p, _root = staged
    plain = lww_changes_flat(proj, keys, vals)
    fused = lww_changes_flat(
        proj.withColumns({k: F.col(k).cast("string") for k in keys}),
        keys, vals, bucket_expr=_bucket_col(keys, 8),
    )
    assert fused.columns[0] == "_bucket"
    assert _n_exchanges(fused) == 1
    a = sorted(tuple(r) for r in plain.collect())
    b = sorted(tuple(r)[1:] for r in fused.collect())
    assert a == b and a


def test_fused_merge_final_state_matches_unfused(spark, staged):
    """End-to-end: the default (fused) ingest and a salted (two-exchange)
    ingest of the same stream produce byte-identical final states."""
    frames, _proj, _keys, _vals, p, root = staged

    def ingest(salt):
        tmp = tempfile.mkdtemp(prefix="fused_mor_")
        t = LakeTable.create(
            spark, f"{tmp}/lake",
            schema=[(c, "string") for c in gen.ALL_COLUMNS],
            key_cols=list(gen.KEY_COLUMNS), n_buckets=8,
        )
        pipeline.run_ingest(spark, frames, t, n_batches=3, clustered=True,
                            salt_buckets=salt)
        return sorted(tuple(r) for r in t.read().collect())

    assert ingest(0) == ingest(4)


def test_bucketed_modulus_race_falls_back(spark, staged):
    """A change set staged under a stale modulus must be re-bucketed by
    the merge (never committed under the wrong layout)."""
    from pypgoutput_spark.operators.merge import merge_into

    frames, proj, keys, vals, _p, _root = staged
    tmp = tempfile.mkdtemp(prefix="fused_race_")
    t = LakeTable.create(
        spark, f"{tmp}/lake",
        schema=[(c, "string") for c in gen.ALL_COLUMNS],
        key_cols=list(gen.KEY_COLUMNS), n_buckets=8,
    )
    changes = lww_changes_flat(
        proj.withColumns({k: F.col(k).cast("string") for k in keys}),
        keys, vals, bucket_expr=_bucket_col(keys, 4),  # stale modulus: 4 != 8
    )
    m = merge_into(t, changes, watermark_lsn=10_000, bucketed=4)
    assert not m["skipped"]
    snap = t.snapshot()
    assert snap["n_buckets"] == 8
    # every staged bucket id must be valid under the TABLE's modulus
    assert all(0 <= int(b) < 8 for b in snap["buckets"])
    # and the rows must resolve under bucket-pruned reads (lookup uses
    # the table modulus — a wrong layout would lose keys)
    full = sorted(tuple(r) for r in t.read().collect())
    assert full
    probe = t.read().selectExpr(*keys).limit(20)
    assert t.lookup(probe).count() == 20
