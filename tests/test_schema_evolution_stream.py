"""Stream-driven schema evolution: a Relation re-send mid-stream evolves
the lake table before the merge (last-Relation-wins, reference
reader.py:222-243), with old-version events aligned via NULLs."""

from __future__ import annotations

from pypgoutput_spark.lake.table import LakeTable
from pypgoutput_spark.streaming import pipeline
from pypgoutput_spark.wal import codec
from pypgoutput_spark.wal import generator as gen

RID = gen.RELATION_ID
V0_COLS = gen.RELATION_COLUMNS
V1_COLS = gen.RELATION_COLUMNS + ((0, "stars", 20, -1),)


def _frames(spark):
    def cells5(repo, path, c, lang, content, content_cat="t"):
        return [("t", repo), ("t", path), ("t", c), ("t", lang),
                (content_cat, content if content_cat == "t" else None)]

    rows = [
        (0, 1, "R", codec.encode_relation(RID, "public", "repo_files", "d", V0_COLS)),
        (0, 10, "B", codec.encode_begin(10, 1_000_000, 1)),
        (0, 11, "I", codec.encode_insert(RID, cells5("a", "p1", "c1", "py", "body1"))),
        (0, 12, "I", codec.encode_insert(RID, cells5("a", "p2", "c2", "py", "old2"))),
        (0, 13, "C", codec.encode_commit(12, 13, 1_000_000)),
        # DDL: new column `stars` (bigint) — Relation re-sent
        (0, 20, "R", codec.encode_relation(RID, "public", "repo_files", "d", V1_COLS)),
        (0, 22, "B", codec.encode_begin(22, 2_000_000, 2)),
        (0, 23, "I", codec.encode_insert(
            RID, cells5("a", "p3", "c3", "py", "body3") + [("t", "5")])),
        # update p1 with TOAST-unchanged content + stars=7
        (0, 24, "U", codec.encode_update(
            RID, cells5("a", "p1", "c1b", "py", None, content_cat="u") + [("t", "7")])),
        (0, 25, "C", codec.encode_commit(24, 25, 2_000_000)),
    ]
    return spark.createDataFrame(
        [(s, l, m, bytearray(p)) for s, l, m, p in rows], schema=gen.FRAMES_SCHEMA
    )


def test_relation_resend_evolves_table_and_merges(spark, tmp_path):
    table = LakeTable.create(
        spark, str(tmp_path / "lake"),
        schema=[(c, "string") for c in gen.ALL_COLUMNS],
        key_cols=list(gen.KEY_COLUMNS), n_buckets=4,
    )
    metrics = pipeline.run_ingest(spark, _frames(spark), table)
    assert not metrics[0]["skipped"]
    snap = table.snapshot()
    assert ["stars", "bigint"] in snap["schema"]
    rows = {
        (r["repo"], r["path"]): r
        for r in table.read().collect()
    }
    assert set(rows) == {("a", "p1"), ("a", "p2"), ("a", "p3")}
    # p1: updated under v1 — commit from the update, content preserved
    # through the TOAST-'u' cell by in-batch lookback, stars typed
    assert rows[("a", "p1")]["commit"] == "c1b"
    assert rows[("a", "p1")]["content"] == "body1"
    # stars declared bigint by OID 20 — merge casts the text wire value
    assert rows[("a", "p1")]["stars"] == 7
    assert snap["schema"][-1] == ["stars", "bigint"]
    # p2: v0 event only — stars NULL after evolution
    assert rows[("a", "p2")]["stars"] is None
    assert rows[("a", "p2")]["content"] == "old2"
    # p3: inserted under v1
    assert rows[("a", "p3")]["stars"] == 5


def test_in_chunk_relation_resend_mid_stream(spark, tmp_path):
    """DDL *inside* a streamed transaction: PG14+ re-sends the Relation
    in-chunk ('r', subxid-prefixed) when a streamed txn first touches the
    table after an ALTER. Events before the in-chunk R decode under v0,
    events after under v1 (the registry is LSN-versioned, and in-chunk
    events keep their own LSN) — and the merge evolves the lake table,
    on BOTH kernels."""
    from pypgoutput_spark.operators import decode as decode_op

    x = 9101

    def cells5(repo, path, c, lang, content):
        return [("t", repo), ("t", path), ("t", c), ("t", lang), ("t", content)]

    rows = [
        (0, 1, "R", codec.encode_relation(RID, "public", "repo_files", "d", V0_COLS)),
        (0, 10, "S", codec.encode_stream_start(x, True)),
        (0, 11, "i", codec.add_stream_xid(
            codec.encode_insert(RID, cells5("a", "p1", "c1", "py", "b1")), x)),
        # ALTER TABLE ... ADD COLUMN stars, mid-stream: in-chunk R re-send
        (0, 12, "r", codec.add_stream_xid(
            codec.encode_relation(RID, "public", "repo_files", "d", V1_COLS), x)),
        (0, 13, "i", codec.add_stream_xid(
            codec.encode_insert(
                RID, cells5("a", "p3", "c3", "py", "b3") + [("t", "5")]), x)),
        (0, 14, "E", codec.encode_stream_stop()),
        (0, 15, "c", codec.encode_stream_commit(x, 14, 15, 3_000_000)),
    ]
    frames = spark.createDataFrame(
        [(s, l, m, bytearray(p)) for s, l, m, p in rows], schema=gen.FRAMES_SCHEMA
    )
    for vectorized in (False, True):
        got = {r["lsn"]: r for r in decode_op.decode_frames_raw(
            frames, strict=True, vectorized=vectorized
        ).collect()}
        assert set(got) == {11, 13}, (vectorized, sorted(got))
        # pre-R event under v0, post-R under v1 — distinct schema versions
        assert got[11]["schema_version"] != got[13]["schema_version"]
        assert len(got[11]["new_vals"]) == 5 and len(got[13]["new_vals"]) == 6
        assert got[11]["xid"] == x and got[13]["xid"] == x

    table = LakeTable.create(
        spark, str(tmp_path / "lake"),
        schema=[(c, "string") for c in gen.ALL_COLUMNS],
        key_cols=list(gen.KEY_COLUMNS), n_buckets=4,
    )
    pipeline.run_ingest(spark, frames, table, strict=True)
    rows_by_key = {(r["repo"], r["path"]): r for r in table.read().collect()}
    assert set(rows_by_key) == {("a", "p1"), ("a", "p3")}
    assert rows_by_key[("a", "p1")]["stars"] is None
    assert rows_by_key[("a", "p3")]["stars"] == 5
    assert ["stars", "bigint"] in table.snapshot()["schema"]
