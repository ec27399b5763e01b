"""Filesystem table clone (`__spark_entry__._clone_table`): the private
copy a MUTATING bench consumer gets instead of re-running the identical
deterministic ingest. Pins the two properties the sharing scheme relies
on: the clone reads identically to its source, and the two tables are
fully isolated — no clone snapshot references a source directory, so
mutation/compaction on either side cannot disturb the other."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _mk_ingested(spark, tmp_path):
    import __spark_entry__ as E
    from pypgoutput_spark.lake.table import LakeTable
    from pypgoutput_spark.streaming import pipeline
    from pypgoutput_spark.wal import generator as gen

    p = gen.GenParams(n_txns=60, ops_per_txn=6, n_repos=20, n_paths=12,
                      toast_pct=20, txns_per_segment=10)
    table = LakeTable.create(
        spark, str(tmp_path / "src"),
        schema=[(c, "string") for c in gen.ALL_COLUMNS],
        key_cols=list(gen.KEY_COLUMNS), n_buckets=4,
    )
    pipeline.run_ingest(spark, gen.spark_frames_df(spark, p), table,
                        n_batches=2)
    return E, table


def _rows(table):
    return sorted(
        tuple(r) for r in table.read().selectExpr(
            "repo", "path", "`commit`", "lang", "content").collect()
    )


def test_clone_reads_identically_and_is_self_contained(spark, tmp_path):
    E, src = _mk_ingested(spark, tmp_path)
    clone = E._clone_table(spark, src)
    assert clone.path != src.path
    assert _rows(clone) == _rows(src)
    assert clone.watermark_lsn == src.watermark_lsn
    # self-containment: no clone snapshot references a source directory
    meta = os.path.join(clone.path, "_meta")
    for root, _dirs, files in os.walk(meta):
        for f in files:
            if f.endswith(".json"):
                txt = open(os.path.join(root, f)).read()
                assert src.path not in txt, f
    # every data dir the clone's head references exists under the clone
    snap = clone.snapshot()
    for dirs in list(snap["buckets"].values()) + list(
            snap.get("deltas", {}).values()):
        for d in dirs:
            assert d.startswith(clone.path), d
            assert os.path.isdir(d), d


def test_mutations_do_not_cross_the_clone_boundary(spark, tmp_path):
    E, src = _mk_ingested(spark, tmp_path)
    before = _rows(src)
    clone = E._clone_table(spark, src)
    # mutate the clone: hard-delete a key subset
    victims = clone.read().selectExpr("repo", "path").where(
        "md5(concat(repo, '|', path)) < '40'").distinct()
    n_victims = victims.count()
    assert n_victims > 0
    clone.erase(victims)
    assert len(_rows(clone)) == len(before) - n_victims
    assert _rows(src) == before, "erase on the clone leaked into the source"
    # mutate the source: compaction + a full layout rewrite
    src.compact()
    src.rebucket(8)
    assert _rows(src) == before
    assert len(_rows(clone)) == len(before) - n_victims, (
        "source compaction/rebucket disturbed the clone")
