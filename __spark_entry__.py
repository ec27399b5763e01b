"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: the full CDC pipeline (deterministic binary
pgoutput WAL stream → vectorized decode → LWW → bucketed lake merge) at
small scale, returning the final merged table state.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
(SURVEY.md §2 + the training-data operator suite). Every SQL-expressible
operator has a DuckDB oracle built from the *same* deterministic
expressions (see pypgoutput_spark/functions/detsql.py); the two CDC
binary-pipeline entries carry standalone oracles that regenerate the
logical change stream in pure SQL and replay it with serial reference
semantics — the oracle never touches the binary path, so a match proves
encode → decode → merge end-to-end.
"""

from __future__ import annotations

import json as _json
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pypgoutput_spark.lake.table import LakeTable
from pypgoutput_spark.operators import (
    analytics as _analytics,
    asof as _asof,
    binary_cdc as _binary_cdc,
    bloomjoin as _bloomjoin,
    corpus_cdc as _corpus_cdc,
    decode as _decode,
    scd as _scd,
    sketches as _sketches,
    dedup as _dedup,
    multimodal as _multimodal,
    outbox as _outbox,
    similarity as _similarity,
    text as _text,
)
from pypgoutput_spark.plans import registry as _registry_mod
from pypgoutput_spark.streaming import pipeline as _pipeline
from pypgoutput_spark.wal import generator as _gen

#: fixed parameters for the CDC correctness entries (self-synthesized
#: deterministic input — independent of sf_dir per the input hint)
P_ENTRY = _gen.GenParams(
    n_txns=150, ops_per_txn=8, n_repos=50, n_paths=30,
    toast_pct=30, truncate_every=40, txns_per_segment=15,
)

#: two interleaved relations with relation-scoped truncates
P_MULTI = _gen.GenParams(
    n_txns=120, ops_per_txn=8, n_repos=40, n_paths=24,
    toast_pct=30, truncate_every=30, txns_per_segment=12, n_relations=2,
)

#: key-changing updates ('K' before-images; replay = delete old + upsert new)
P_KEYCHANGE = _gen.GenParams(
    n_txns=120, ops_per_txn=8, n_repos=35, n_paths=24,
    toast_pct=30, txns_per_segment=12, key_change_pct=25,
)

#: protocol-v2 streamed in-progress transactions (PG14+ streaming=on):
#: 40% of txns stream as S/DML(xid)/E chunks + Stream Commit; a quarter
#: of those ABORT — their events must vanish from the final state.
#: interleave_streams: adjacent streamed txns' chunks INTERLEAVE (the
#: real busy-walsender shape, r5) — concurrent streams buffer keyed by
#: (segment, xid) and decode on the vectorized path
P_STREAMED = _gen.GenParams(
    n_txns=120, ops_per_txn=8, n_repos=40, n_paths=24,
    toast_pct=30, txns_per_segment=12, stream_pct=40, stream_abort_pct=25,
    interleave_streams=True,
)

#: two-phase commit (PG15+ ``two_phase``): 35% of txns PREPARE ('b'..'P')
#: and their decision — Commit Prepared 'K', or Rollback Prepared 'r'
#: for a quarter of them — lands 30 txn windows later: with 14 txns per
#: segment and a 3-batch ingest, decisions routinely arrive in a LATER
#: micro-batch, so the engine must stage the prepared events and resolve
#: them when the 'K'/'r' lands (rolled-back events must vanish)
P_TWO_PHASE = _gen.GenParams(
    n_txns=140, ops_per_txn=8, n_repos=45, n_paths=28,
    toast_pct=30, txns_per_segment=14,
    two_phase_pct=35, two_phase_rollback_pct=25, two_phase_gap=30,
)

#: replication-origin filtering (active-active loop prevention): 40% of
#: txns carry an Origin message 'O' — their rows were replicated FROM
#: another node; 35% of txns also stream as protocol-v2 chunks (a
#: foreign streamed txn's 'O' rides its first chunk, xid-prefixed), so
#: the entry exercises BOTH filter paths: v1 spans (per-segment flag,
#: cut-carried) and v2 streams (dropped at seal). The engine ingests
#: with ``skip_foreign_origins=True`` and must apply ONLY the locally-
#: originated committed transactions. The oracle replays with foreign
#: AND aborted txns excluded (the reference stubs 'O' — parity-plus).
P_ORIGIN = _gen.GenParams(
    n_txns=140, ops_per_txn=8, n_repos=45, n_paths=28,
    toast_pct=30, txns_per_segment=14, origin_pct=40,
    stream_pct=35, stream_abort_pct=20,
)

#: streamed two-phase (PG15 ``streaming = on, two_phase = on``): 45% of
#: txns stream as v2 chunks; of ALL txns 35% prepare — a txn drawing
#: both seals its stream with Stream Prepare 'p' (the v2 spelling of
#: 'P') instead of Stream Commit, and its K/r decision lands 30 txn
#: windows (2+ segments, typically a later micro-batch) later. Plain
#: streams keep their c/A fate; plain prepared txns keep b..P. All four
#: transaction grammars interleave in one WAL.
P_STREAM2PC = _gen.GenParams(
    n_txns=140, ops_per_txn=8, n_repos=45, n_paths=28,
    toast_pct=30, txns_per_segment=14,
    stream_pct=45, stream_abort_pct=25,
    two_phase_pct=35, two_phase_rollback_pct=25, two_phase_gap=30,
)

#: mid-stream DDL: at txn 70 (a segment boundary's first txn) the
#: relation gains a trailing BIGINT ``stars`` column — the wire carries
#: a Relation re-send and 6-cell tuples from there on; the merge must
#: evolve the lake table, type the new column from its OID, and leave
#: rows last written before the boundary NULL-aligned
#: (no truncate here: a post-boundary truncate would wipe every
#: pre-boundary row and the NULL-alignment behavior would vanish from
#: the final state; truncate×evolution decode is pinned in
#: tests/test_schema_evolution_gen.py instead)
P_EVOLVE = _gen.GenParams(
    n_txns=140, ops_per_txn=8, n_repos=45, n_paths=28,
    toast_pct=30, txns_per_segment=14, evolve_at_txn=70,
)

#: MV-maintenance run: ingested in FIVE batches so the commit history
#: mixes an initial base load, three merge-on-read delta commits (the
#: pre-image path), and one truncate rewrite (txn 130 → batch 5)
P_MVIEW = _gen.GenParams(
    n_txns=150, ops_per_txn=8, n_repos=50, n_paths=30,
    toast_pct=30, truncate_every=130, txns_per_segment=15,
)


#: per-process memo of ingested fixtures: several entries consume the
#: IDENTICAL deterministic ingest (P_ENTRY feeds final-state,
#: time-travel, point-lookup and version-diff; P_FEED feeds the change
#: feed and SCD2) — read-only consumers share one table instead of each
#: re-running the same 8-15 s ingest. Mutating consumers (rebucket,
#: erase, redact) pass clone=True: they get a private self-contained
#: filesystem copy of the shared ingest (see ``_clone_table``) instead
#: of re-paying the whole decode+merge for identical state.
_INGEST_MEMO: dict = {}

#: per-process memo of MATERIALIZED frame streams: the deterministic
#: generator emits byte-identical frames for identical GenParams, and
#: several entries replay the same stream (P_ENTRY feeds seven entries
#: between re-ingests); materializing once to parquet means every scan
#: of the ingest (stats prescan, decode+merge per batch) reads a tiny
#: column-pruned parquet instead of re-running the Python generator —
#: and the parquet layout is segment-clustered (generator partitions are
#: contiguous segment runs), so the decode skips its per-batch
#: repartition-by-segment exchange whenever ``frames_clustered_safe``
#: holds for the written files (no file large enough for the scan to
#: split it — the same contract bench.py's headline uses).
_FRAMES_MEMO: dict = {}


def _frames_parquet(spark: SparkSession, p: _gen.GenParams) -> DataFrame:
    from pypgoutput_spark.operators.corpus_cdc import frames_clustered_safe

    hit = _FRAMES_MEMO.get(p)
    if hit is None or hit[0] is not spark:
        tmp = tempfile.mkdtemp(prefix="pypgoutput_spark_frames_")
        path = f"{tmp}/frames"
        _gen.spark_frames_df(spark, p).write.parquet(path)
        # clustered decode is only claimed while no file can be SPLIT by
        # the scan (segment-per-partition contract); larger streams fall
        # back to the repartition decode automatically
        _FRAMES_MEMO[p] = (spark, path, frames_clustered_safe(path))
    return spark.read.parquet(_FRAMES_MEMO[p][1])


def _frames_clustered(p: _gen.GenParams) -> bool:
    return bool(_FRAMES_MEMO.get(p, (None, None, False))[2])


def _clone_table(spark: SparkSession, src: LakeTable) -> LakeTable:
    """Private filesystem copy of an ingested table for a MUTATING
    consumer: re-running the identical deterministic ingest per mutator
    re-pays decode+merge compute for state that is a pure function of
    the already-ingested bytes — cloning is O(table bytes) (hundreds of
    KB here), the re-ingest O(stream compute). Snapshots record
    absolute staging dirs, so every ``_meta`` JSON has the source root
    rewritten to the clone root: the clone is fully self-contained and
    neither table's mutation/compaction/vacuum can ever touch the
    other's files."""
    import os as _os
    import shutil as _shutil

    src.wait_maintenance()  # no half-staged commit dirs mid-copy
    tmp = tempfile.mkdtemp(prefix="pypgoutput_spark_clone_")
    dst = f"{tmp}/lake"
    _shutil.copytree(src.path, dst)
    for root, _dirs, files in _os.walk(_os.path.join(dst, "_meta")):
        for f in files:
            if not f.endswith(".json"):
                continue
            fp = _os.path.join(root, f)
            with open(fp) as fh:
                txt = fh.read()
            if src.path in txt:
                with open(fp, "w") as fh:
                    fh.write(txt.replace(src.path, dst))
    return LakeTable(spark, dst)


def _ingest_cdc(spark: SparkSession, p: _gen.GenParams,
                kc_toast_passes: int = 0, strict: bool = True,
                n_batches: int = 3, fresh: bool = False,
                skip_foreign_origins: bool = False,
                props: dict | None = None,
                clone: bool = False) -> LakeTable:
    if clone:
        return _clone_table(spark, _ingest_cdc(
            spark, p, kc_toast_passes=kc_toast_passes, strict=strict,
            n_batches=n_batches, skip_foreign_origins=skip_foreign_origins,
            props=props,
        ))
    key = (p, kc_toast_passes, strict, n_batches, skip_foreign_origins,
           _json.dumps(props, sort_keys=True) if props else None)
    if not fresh:
        hit = _INGEST_MEMO.get(key)
        if hit is not None and hit[0] is spark:
            return hit[1]
    tmp = tempfile.mkdtemp(prefix="pypgoutput_spark_lake_")
    table = LakeTable.create(
        spark, f"{tmp}/lake",
        schema=[(c, "string") for c in _gen.ALL_COLUMNS],
        key_cols=list(_gen.KEY_COLUMNS), n_buckets=8, props=props,
    )
    frames = _frames_parquet(spark, p)
    _pipeline.run_ingest(spark, frames, table, n_batches=n_batches,
                         kc_toast_passes=kc_toast_passes, strict=strict,
                         skip_foreign_origins=skip_foreign_origins,
                         clustered=_frames_clustered(p))
    if not fresh:
        _INGEST_MEMO[key] = (spark, table)
    return table


def _run_cdc_pipeline(spark: SparkSession, p: _gen.GenParams,
                      kc_toast_passes: int = 0, strict: bool = True,
                      skip_foreign_origins: bool = False) -> DataFrame:
    table = _ingest_cdc(spark, p, kc_toast_passes=kc_toast_passes, strict=strict,
                        skip_foreign_origins=skip_foreign_origins)
    return table.read().selectExpr(
        "repo", "path", "`commit`", "lang", "content",
        "sha2(content, 256) AS content_sha",
    )


def q_cdc_pipeline_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_cdc_pipeline(spark, P_ENTRY)


def q_cdc_streamed_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Protocol-v2 streamed transactions end-to-end, chunks of adjacent
    transactions INTERLEAVED (the real streaming=on walsender shape):
    streams decode on the VECTORIZED path (r5 — offset-math chunk
    resolution in wal.vdecode; the loop kernel remains only as the
    dead-letter fallback), aborted streams vanish, committed streams
    stamp begin/commit metadata from S/c — final state ≡ the serial
    oracle with aborted txns excluded."""
    return _run_cdc_pipeline(spark, P_STREAMED, strict=False)


def q_cdc_two_phase_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase commit end-to-end (PG15+ ``two_phase``; parity-plus —
    the reference decoder predates 'b'/'P'/'K'/'r'): prepared
    transactions' bodies decode like any B..C span, their events are
    STAGED until the Commit/Rollback Prepared decision arrives (here 30
    txn windows later — routinely a later micro-batch), committed ones
    merge with the 'K' commit timestamp re-stamped, rolled-back ones
    vanish. Late resolution stays exact because every merge is
    LSN-resolved, mirroring PostgreSQL's own guarantee that a prepared
    transaction's row locks block conflicting writers until the
    decision. Final state ≡ the serial replay-by-LSN oracle with
    rolled-back transactions excluded."""
    return _run_cdc_pipeline(spark, P_TWO_PHASE)


def q_cdc_streamed_two_phase_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streamed two-phase end-to-end (PG15 ``streaming=on, two_phase=on``;
    parity-plus — the reference pins proto v1): large transactions stream
    as v2 chunks and seal with Stream Prepare 'p' (the v2 spelling of
    'P'); their buffered events release stamped with the prepare
    timestamp and are STAGED until the Commit/Rollback Prepared decision
    arrives ~2 segments (a later micro-batch) downstream. Plain streams
    (c/A), plain prepared txns (b..P) and plain B..C txns interleave in
    the same WAL. Decode stays on the vectorized kernel — 'p' merges
    into the Stream Commit cohort with its own header offsets. Final
    state ≡ the serial replay-by-LSN oracle with aborted streams and
    rolled-back prepared transactions excluded."""
    return _run_cdc_pipeline(spark, P_STREAM2PC)


def q_cdc_origin_filtered_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replication-origin filtering end-to-end (active-active loop
    prevention; parity-plus — the reference stubs 'O'): 40% of
    transactions carry an Origin message (their rows were replicated
    FROM another node) — right after Begin for v1 spans, inside the
    first chunk (xid-prefixed) for the 35% that stream as protocol-v2.
    The engine ingests with ``skip_foreign_origins=True``: both kernels
    drop the foreign transactions' events on both paths (v1 spans: one
    extra maximum.accumulate over the 'O' cohort; v2 streams: one extra
    sorted-key membership at seal — no loop fallback), the span-carry
    survives micro-batch cuts, and the final state equals the serial
    oracle over LOCALLY-originated committed transactions only."""
    return _run_cdc_pipeline(spark, P_ORIGIN, skip_foreign_origins=True)


def q_cdc_schema_evolution_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mid-stream schema evolution end-to-end (reference last-Relation-
    wins, reader.py:222-243): a Relation re-send at txn 70 adds a BIGINT
    ``stars`` column; earlier events decode under v0 via the
    LSN-versioned registry, the merge evolves the lake table (typed from
    OID 20), pre-boundary rows read NULL, and truncates/TOAST semantics
    carry through unchanged."""
    table = _ingest_cdc(spark, P_EVOLVE)
    return table.read().selectExpr(
        "repo", "path", "`commit`", "lang", "content", "stars",
        "sha2(content, 256) AS content_sha",
    )


def q_cdc_decoded_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-only slice: binary frames → typed I/U change events."""
    frames = _gen.spark_frames_df(spark, P_ENTRY)
    events = _decode.decode_frames(frames)
    return events.filter("op IN ('I','U')").selectExpr(
        "lsn", "op",
        "after['repo'] AS repo", "after['path'] AS path",
        "after['commit'] AS commit", "after['lang'] AS lang",
        "after['content'] AS content",
        "array_contains(coalesce(after_unchanged, array()), 'content') AS content_unchanged",
        "xid", "begin_lsn",
    )


def q_cdc_multi_relation_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-relation routing: two relations interleaved in one WAL
    stream, each merged into its own lake table, truncates scoped to the
    relation they list (reference any-relation dispatch,
    reader.py:124-132, 252-258)."""
    from pyspark.sql import functions as F

    tmp = tempfile.mkdtemp(prefix="pypgoutput_spark_multi_")
    tables = {
        _gen.RELATION_ID + r: LakeTable.create(
            spark, f"{tmp}/lake_{r}",
            schema=[(c, "string") for c in _gen.ALL_COLUMNS],
            key_cols=list(_gen.KEY_COLUMNS), n_buckets=8,
        )
        for r in range(P_MULTI.n_relations)
    }
    frames = _frames_parquet(spark, P_MULTI)
    _pipeline.run_ingest(spark, frames, tables, n_batches=2,
                         clustered=_frames_clustered(P_MULTI))
    parts = [
        t.read().select(
            F.lit(rid).cast("bigint").alias("relation_id"),
            "repo", "path", "commit", "lang", "content",
            F.expr("sha2(content, 256)").alias("content_sha"),
        )
        for rid, t in sorted(tables.items())
    ]
    out = parts[0]
    for p_df in parts[1:]:
        out = out.unionByName(p_df)
    return out


#: epoch 2 of a 3-batch segment-split P_MULTI ingest covers segments
#: [0, 2*ceil(n_segments/3)) — whole transactions, since plain B..C
#: spans never cross segments. The oracle replays the stream capped at
#: that transaction boundary.
def _epoch2_txn_cut(p: _gen.GenParams, n_batches: int = 3) -> int:
    import math

    n_segs = math.ceil(p.n_txns / p.txns_per_segment)
    span = math.ceil(n_segs / n_batches)
    return min(n_segs, 2 * span) * p.txns_per_segment


def q_cdc_epoch_consistent_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table consistent read AS OF a mid-stream epoch (multi-table
    time travel — the capability Iceberg/Delta lack: per-table commits
    publish at different instants, so version-level time travel alone
    can return relation A at batch N joined with relation B at batch
    N-1). The ingest publishes ONE epoch record per batch after ALL
    tables' merges committed ({epoch, watermark_lsn, {rid: version}},
    lake/epochs.py); this query resolves epoch 2 of 3 and reads BOTH
    relations at their pinned versions. Oracle: the serial replay capped
    at epoch 2's transaction boundary — a match proves the pinned pair
    is exactly the state the WAL defined at that boundary, for both
    tables at once. The ingest also runs the WAL continuity guard
    (sources/frames.check_continuity)."""
    from pyspark.sql import functions as F

    from pypgoutput_spark.lake.epochs import EpochLog

    key = ("epochs", P_MULTI)
    hit = _INGEST_MEMO.get(key)
    if hit is not None and hit[0] is spark:
        tables, log = hit[1], hit[2]
    else:
        tmp = tempfile.mkdtemp(prefix="pypgoutput_spark_epochs_")
        tables = {
            _gen.RELATION_ID + r: LakeTable.create(
                spark, f"{tmp}/lake_{r}",
                schema=[(c, "string") for c in _gen.ALL_COLUMNS],
                key_cols=list(_gen.KEY_COLUMNS), n_buckets=8,
            )
            for r in range(P_MULTI.n_relations)
        }
        log = EpochLog.create(f"{tmp}/epochs")
        frames = _frames_parquet(spark, P_MULTI)
        _pipeline.run_ingest(spark, frames, tables, n_batches=3,
                             epoch_log=log, verify_continuity=True,
                             clustered=_frames_clustered(P_MULTI))
        _INGEST_MEMO[key] = (spark, tables, log)
    assert log.current_epoch() == 3, log.current_epoch()
    pinned = log.read_all(tables, epoch=2)
    parts = [
        df.select(
            F.lit(rid).cast("bigint").alias("relation_id"),
            "repo", "path", "commit", "lang", "content",
            F.expr("sha2(content, 256)").alias("content_sha"),
        )
        for rid, df in sorted(pinned.items())
    ]
    out = parts[0]
    for p_df in parts[1:]:
        out = out.unionByName(p_df)
    return out


def q_cdc_keychange_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-change updates: the 'K' before-image key is deleted and the
    new key upserted (reference old-key assertion,
    tests/test_reader.py:231-251; serial replay semantics). The stream
    includes key-change updates whose new image ALSO carries an
    unchanged-TOAST content cell — resolved from the old key's chain /
    stored row by operators.kc_toast (bounded passes; the oracle replays
    the same algorithm in SQL)."""
    return _run_cdc_pipeline(spark, P_KEYCHANGE, kc_toast_passes=4)


def q_cdc_decoded_events_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-batch transaction scope: the stream is cut mid-transaction
    into two decode batches; the open-transaction carry re-stamps the
    straddled events exactly (reference reader.py:182-193 semantics).
    Same oracle as cdc_decoded_events — a match proves the carry."""
    frames = _gen.spark_frames_df(spark, P_ENTRY)
    # cut inside txn 75: its slots span [10+75*stride, 10+75*stride+9]
    cut = 10 + 75 * P_ENTRY.lsn_stride + 4
    b1 = frames.filter(f"lsn < {cut}")
    b2 = frames.filter(f"lsn >= {cut}")
    registry = _registry_mod.RelationRegistry.from_frames(frames)
    carry = _pipeline.open_tx_carry(b1)
    assert carry, "cut must fall inside an open transaction"
    ev1 = _decode.decode_frames(b1, registry)
    ev2 = _decode.decode_frames(b2, registry, open_tx=carry)
    return ev1.unionByName(ev2).filter("op IN ('I','U')").selectExpr(
        "lsn", "op",
        "after['repo'] AS repo", "after['path'] AS path",
        "after['commit'] AS commit", "after['lang'] AS lang",
        "after['content'] AS content",
        "array_contains(coalesce(after_unchanged, array()), 'content') AS content_unchanged",
        "xid", "begin_lsn",
    )


def q_cdc_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot time travel: ingest the full stream in three batches,
    then read the table AT VERSION 2 — the state after the second batch,
    i.e. WAL segments 0-7 = the first 120 transactions. The oracle
    replays exactly that prefix (the generator is deterministic per
    transaction, so a 120-txn GenParams emits the identical logical
    prefix), proving snapshot immutability + historical reads end-to-end:
    the version-2 files must still reproduce the exact pre-batch-3 state
    after batch 3 has committed on top."""
    table = _ingest_cdc(spark, P_ENTRY)
    return table.read(version=2).selectExpr(
        "repo", "path", "`commit`", "lang", "content",
        "sha2(content, 256) AS content_sha",
    )


#: the 120-txn prefix of P_ENTRY (batches 1-2 cover segments 0-7)
P_ENTRY_PREFIX = _gen.GenParams(
    n_txns=120, ops_per_txn=8, n_repos=50, n_paths=30,
    toast_pct=30, truncate_every=40, txns_per_segment=15,
)


def q_cdc_incremental_mview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downstream incremental consumer: maintain a per-lang (count,
    sum-of-content-length) materialized view from the change feed, one
    commit at a time — pre-images fetched bucket-pruned from the parent
    snapshot, TOAST-unchanged cells resolved from pre-images, truncates
    resetting the view (operators/mview.py). The oracle recomputes the
    aggregate over the replayed final state, so a hash match proves the
    delta-maintenance algebra across every commit of the run (initial
    base load, three MOR delta merges with pre-image fetches, TOAST
    carriers, deletes, and a truncate reset + re-feed)."""
    from pypgoutput_spark.operators.mview import incremental_group_mv

    table = _ingest_cdc(spark, P_MVIEW, n_batches=5)
    return incremental_group_mv(table, group_col="lang", length_col="content")


def _cdc_incremental_mview_oracle(p: _gen.GenParams) -> str:
    return f"""
WITH final_state AS ({_gen.duckdb_final_state_sql(p, with_sha=False)})
SELECT lang, count(*) AS n_docs,
  CAST(sum(length(content)) AS BIGINT) AS n_chars
FROM final_state GROUP BY lang
""".strip()


_DIFF_PREDICATE = """
  a.repo IS NULL OR b.repo IS NULL
  OR NOT (a.content IS NOT DISTINCT FROM b.content
      AND a.`commit` IS NOT DISTINCT FROM b.`commit`
      AND a.lang IS NOT DISTINCT FROM b.lang)
""".strip()


def _diff_sql(quote: str = "`") -> str:
    # identical text in both dialects apart from the identifier quote
    q = quote
    return f"""
SELECT coalesce(b.repo, a.repo) AS repo,
  coalesce(b.path, a.path) AS path,
  CASE WHEN a.repo IS NULL THEN 'I'
       WHEN b.repo IS NULL THEN 'D' ELSE 'U' END AS change,
  b.{q}commit{q} AS commit_after, b.lang AS lang_after,
  b.content_sha AS content_sha_after
FROM snap_a a FULL JOIN snap_b b
  ON a.repo = b.repo AND a.path = b.path
WHERE {_DIFF_PREDICATE.replace('`', q)}
""".strip()


def q_cdc_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-diff audit: what changed between two mirror versions,
    computed from the SNAPSHOTS themselves (a full outer join on keys
    with null-safe column compare) — the reconciliation read a consumer
    runs when it cannot trust (or has expired) the change feed. Version
    2 of the 3-batch ingest is exactly the 120-txn prefix, so the
    oracle diffs two INDEPENDENT full replays (prefix vs full) — a hash
    match proves inserts, updates (incl. TOAST carriers resolved at
    each endpoint), deletes and the in-window truncate all reconcile."""
    table = _ingest_cdc(spark, P_ENTRY)
    table.read(version=2).createOrReplaceTempView("snap_a")
    table.read(version=3).selectExpr(
        "repo", "path", "`commit`", "lang", "content",
        "sha2(content, 256) AS content_sha",
    ).createOrReplaceTempView("snap_b")
    return spark.sql(_diff_sql("`"))


def _cdc_version_diff_oracle() -> str:
    return (
        f"WITH snap_a AS ({_gen.duckdb_final_state_sql(P_ENTRY_PREFIX, with_sha=False)}),\n"
        f"snap_b AS ({_gen.duckdb_final_state_sql(P_ENTRY, with_sha=True)})\n"
        + _diff_sql('"')
    )


def q_cdc_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving-table point reads over the CDC mirror: ``LakeTable.lookup``
    answers a key-set probe by scanning ONLY the hash buckets the keys
    map to (manifest bucket pruning — at 100 TB a 64-bucket table reads
    1/64th of its files per probed bucket) and semi-joins the broadcast
    probe; dirty buckets resolve through the normal merge-on-read LWW
    rule. The probe here is the deterministic ~1/8 key subset whose
    ``md5(repo|path)`` starts below '20' — expressible identically in
    the DuckDB oracle, so the hash match proves lookup ≡ filtered full
    read."""
    table = _ingest_cdc(spark, P_ENTRY)
    probe = (
        table.read().selectExpr("repo", "path")
        .where("md5(concat(repo, '|', path)) < '20'").distinct()
    )
    return table.lookup(probe).selectExpr(
        "repo", "path", "`commit`", "lang", "content",
        "sha2(content, 256) AS content_sha",
    )


#: change-feed run: P_ENTRY minus the truncate (the truncate marker is
#: pinned in pytest; keeping the oracle to per-batch LWW collapses keeps
#: it independently derivable) — 10 segments ingested in 3 batches
P_FEED = _gen.GenParams(
    n_txns=150, ops_per_txn=8, n_repos=50, n_paths=30,
    toast_pct=30, txns_per_segment=15,
)
_FEED_BATCHES = 3


def q_cdc_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The change-data-feed itself under the driver harness: ingest in
    three batches, then read ``LakeTable.changes(0)`` — one initial-load
    commit (every row as 'U' at the batch watermark) plus two
    merge-on-read delta commits whose files ARE the feed (keys,
    final_op, max_lsn, values + ``upd_<col>`` carrier flags,
    commit version). The oracle derives the same rows INDEPENDENTLY:
    per-batch LWW collapse over the closed-form event stream with the
    engine's carrier rule (a delete carries an explicit NULL; an
    unchanged-TOAST cell carries nothing), so a hash match proves the
    feed contract end-to-end, not just row counts."""
    table = _ingest_cdc(spark, P_FEED, n_batches=_FEED_BATCHES)
    return table.changes(0).selectExpr(
        "repo", "path", "final_op", "max_lsn",
        "`commit`", "lang", "content",
        "upd_commit", "upd_lang", "upd_content",
        "CAST(_commit_version AS INT) AS commit_version",
    )


def _cdc_change_feed_oracle(p: _gen.GenParams, n_batches: int) -> str:
    n_segments = p.n_txns // p.txns_per_segment
    span = -(-n_segments // n_batches)  # ceil — mirrors run_ingest's split
    stride, ops = p.lsn_stride, p.ops_per_txn
    return f"""
WITH ev AS ({_gen.duckdb_events_sql(p)}),
tagged AS (
  SELECT *, CAST(segment // {span} AS INT) + 1 AS b FROM ev
),
base1 AS (
  -- batch 1 is the initial load (mode=replace): the feed reads the base
  -- files, i.e. the post-batch-1 LWW state, deletes dropped
  SELECT repo, path,
    max_by(op, lsn) AS fop,
    max_by({{'v': "commit"}}, lsn) AS commit_s,
    max_by({{'v': lang}}, lsn) AS lang_s,
    max_by({{'v': CASE WHEN op = 'D' THEN NULL ELSE content END}}, lsn)
      FILTER (WHERE op = 'D' OR NOT content_unchanged) AS content_s
  FROM tagged WHERE b = 1 GROUP BY repo, path
),
feed1 AS (
  SELECT repo, path, 'U' AS final_op,
    (SELECT MAX(10 + txn * {stride} + {ops} + 1) FROM tagged WHERE b = 1) AS max_lsn,
    commit_s.v AS "commit", lang_s.v AS lang, content_s.v AS content,
    true AS upd_commit, true AS upd_lang, true AS upd_content,
    1 AS commit_version
  FROM base1 WHERE fop <> 'D'
),
feedd AS (
  -- delta batches: the delta files are EXACTLY the per-batch LWW
  -- collapse (engine rule: D carries an explicit NULL for every column;
  -- commit/lang are always carried by I/U; content only when not TOAST-'u')
  SELECT repo, path, b,
    max_by(op, lsn) AS final_op,
    max(lsn) AS max_lsn,
    max_by({{'v': CASE WHEN op = 'D' THEN NULL ELSE "commit" END}}, lsn) AS commit_s,
    max_by({{'v': CASE WHEN op = 'D' THEN NULL ELSE lang END}}, lsn) AS lang_s,
    max_by({{'v': CASE WHEN op = 'D' THEN NULL ELSE content END}}, lsn)
      FILTER (WHERE op = 'D' OR NOT content_unchanged) AS content_s
  FROM tagged WHERE b >= 2 GROUP BY repo, path, b
)
SELECT * FROM feed1
UNION ALL
SELECT repo, path, final_op, max_lsn,
  CASE WHEN final_op = 'D' THEN NULL ELSE commit_s.v END AS "commit",
  CASE WHEN final_op = 'D' THEN NULL ELSE lang_s.v END AS lang,
  CASE WHEN final_op = 'D' THEN NULL ELSE content_s.v END AS content,
  true AS upd_commit, true AS upd_lang,
  (content_s IS NOT NULL) AS upd_content,
  CAST(b AS INT) AS commit_version
FROM feedd
""".strip()


def q_cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension history — the classic warehouse consumer of
    a CDC feed: ingest in three batches, read ``changes(0)``, and turn
    every upsert into a version row (valid_from/valid_to at both commit
    and LSN grain, carry-forward for TOAST-unchanged cells, deletes
    closing versions, ``is_current`` flags). The oracle layers the SAME
    window algebra over the INDEPENDENT feed oracle, so a hash match
    proves the history (row images included) end-to-end against the
    closed-form event stream."""
    table = _ingest_cdc(spark, P_FEED, n_batches=_FEED_BATCHES)
    return _scd.scd2_history(
        table.changes(0), ["repo", "path"], ["commit", "lang", "content"]
    )


def q_cdc_repair_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter repair under the driver harness: the transport
    delivers ~1/7 of the DML payloads in the last four WAL segments
    truncated to 2 bytes (undecodable); non-strict ingest quarantines
    them as op='E' dead letters and commits the rest, so the mirror
    diverges from the source. ``streaming.repair.replay_quarantine``
    then re-decodes the affected WINDOW (earliest pending segment
    onward — here the tail ~40% of the stream, pinning the
    cost-∝-window property) from the intact durable frame store,
    LWW-collapses it for the affected keys ONLY, and folds the result
    back as a watermark-neutral repair commit (repair never acks new
    LSNs). The oracle is the UNCHANGED final-state SQL: a hash match
    proves repair restored the exact uncorrupted semantics — late
    deletes and TOAST carriers included."""
    from pyspark.sql import functions as F

    from pypgoutput_spark.streaming.repair import replay_quarantine

    tmp = tempfile.mkdtemp(prefix="pypgoutput_spark_repair_")
    table = LakeTable.create(
        spark, f"{tmp}/lake",
        schema=[(c, "string") for c in _gen.ALL_COLUMNS],
        key_cols=list(_gen.KEY_COLUMNS), n_buckets=8,
    )
    good = _frames_parquet(spark, P_ENTRY)
    corrupted = good.withColumn(
        "payload",
        F.when(
            F.col("mtype").isin("I", "U", "D") & (F.col("lsn") % 7 == 0)
            & (F.col("segment") >= 6),
            F.expr("substring(payload, 1, 2)"),
        ).otherwise(F.col("payload")),
    )
    qdir = f"{tmp}/quarantine"
    _pipeline.run_ingest(spark, corrupted, table, n_batches=3,
                         strict=False, quarantine_dir=qdir,
                         clustered=_frames_clustered(P_ENTRY))
    wm = table.watermark_lsn
    rep = replay_quarantine(spark, good, table, qdir,
                            clustered=_frames_clustered(P_ENTRY))
    assert rep["repaired"] > 0, "corruption must produce dead letters"
    assert table.watermark_lsn == wm, "repair must not move the watermark"
    return table.read().selectExpr(
        "repo", "path", "`commit`", "lang", "content",
        "sha2(content, 256) AS content_sha",
    )


def q_cdc_rebucket_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-count evolution under the driver harness: the CDC mirror is
    ingested at n_buckets=8, rebucketed to 32 (the full layout rewrite a
    growing table performs once its creation-time count leaves oversized
    buckets — pinned-snapshot read, staged new layout, atomic commit
    guarded against racing commits), then read back. The oracle is the
    UNCHANGED final-state SQL: a hash match proves the rewrite changed
    the layout and nothing else."""
    table = _ingest_cdc(spark, P_ENTRY, clone=True)  # rebucket mutates its private clone
    table.rebucket(32)
    assert table.snapshot()["n_buckets"] == 32
    return table.read().selectExpr(
        "repo", "path", "`commit`", "lang", "content",
        "sha2(content, 256) AS content_sha",
    )


def _cdc_point_lookup_oracle(p: _gen.GenParams) -> str:
    return f"""
WITH final_state AS ({_gen.duckdb_final_state_sql(p, with_sha=True)})
SELECT * FROM final_state WHERE md5(repo || '|' || path) < '20'
""".strip()


def q_cdc_erasure_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten under the driver harness: ingest the CDC
    mirror, then ``LakeTable.erase`` the deterministic ~1/8 key subset
    whose ``md5(repo|path)`` starts below '20' — a key-scoped hard
    delete that rewrites only the victims' hash buckets (folding their
    pending deltas), feeds downstream mirrors value-free 'D' rows, and
    leaves the watermark untouched. The oracle is the final-state SQL
    with the INVERSE predicate, so the hash match proves erase removed
    exactly the victims and disturbed nothing else. (Physical purge
    after ``expire_snapshots`` is pinned byte-level in
    tests/test_erasure.py.)"""
    table = _ingest_cdc(spark, P_ENTRY, clone=True)  # erase mutates its private clone
    victims = (
        table.read().selectExpr("repo", "path")
        .where("md5(concat(repo, '|', path)) < '20'").distinct()
    )
    wm = table.watermark_lsn
    # the mutation must live OUTSIDE assert: python -O strips asserts,
    # which would silently return the un-erased table
    erased = table.erase(victims)
    assert erased is not None
    assert table.watermark_lsn == wm, "erase must be watermark-neutral"
    return table.read().selectExpr(
        "repo", "path", "`commit`", "lang", "content",
        "sha2(content, 256) AS content_sha",
    )


def _cdc_erasure_oracle(p: _gen.GenParams) -> str:
    return f"""
WITH final_state AS ({_gen.duckdb_final_state_sql(p, with_sha=True)})
SELECT * FROM final_state WHERE md5(repo || '|' || path) >= '20'
""".strip()


def q_cdc_redaction_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-scoped redaction under the driver harness: ingest the CDC
    mirror, then ``LakeTable.redact`` the ~1/16 key subset below
    md5 '10' — content replaced in place (the PII-remediation path: the
    row/document survives, the offending bytes do not), rows preserved,
    watermark untouched, downstream feed carrying only the replacement.
    The oracle applies the same CASE to the final-state SQL, so the
    hash match proves redact changed exactly the victims' named column
    and nothing else."""
    table = _ingest_cdc(spark, P_ENTRY, clone=True)  # redact mutates its private clone
    victims = (
        table.read().selectExpr("repo", "path")
        .where("md5(concat(repo, '|', path)) < '10'").distinct()
    )
    # mutation outside assert (python -O strips asserts)
    redacted = table.redact(victims, {"content": "__REDACTED__"})
    assert redacted is not None
    return table.read().selectExpr(
        "repo", "path", "`commit`", "lang", "content",
        "sha2(content, 256) AS content_sha",
    )


def _cdc_redaction_oracle(p: _gen.GenParams) -> str:
    red = ("CASE WHEN md5(repo || '|' || path) < '10' "
           "THEN '__REDACTED__' ELSE content END")
    return f"""
WITH final_state AS ({_gen.duckdb_final_state_sql(p, with_sha=False)})
SELECT repo, path, "commit", lang, {red} AS content,
  sha256({red}) AS content_sha
FROM final_state
""".strip()


def q_cdc_zonemap_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest zone maps under the driver harness (the Iceberg
    column-stats analog): the mirror is created with
    ``stats_cols = sort_cols = ["commit"]`` — every commit records each
    staged directory's min/max of ``commit`` in the snapshot, and base
    files are written commit-sorted so the residual range reaches the
    parquet reader as a pushed filter over tight row groups. After
    ingest + compaction, ``scan({"commit": ('4', 'c')})`` prunes
    directories driver-side and filters the survivors; the oracle is
    the final-state SQL wrapped in the same predicate, so the hash
    match proves pruning is a pure superset optimization (dirty buckets
    resolve in full before filtering — LWW-safe; pruning effectiveness
    and the stale-row trap are pinned in tests/test_zonemap.py)."""
    table = _ingest_cdc(spark, P_ENTRY, props={
        "stats_cols": ["commit"], "sort_cols": ["commit"],
    })
    table.wait_maintenance()  # let any auto-scheduled compaction land
    table.compact()           # fold remaining deltas (idempotent)
    return table.scan({"commit": ("4", "c")}).selectExpr(
        "repo", "path", "`commit`", "lang", "content",
        "sha2(content, 256) AS content_sha",
    )


def _cdc_zonemap_oracle(p: _gen.GenParams) -> str:
    return f"""
WITH final_state AS ({_gen.duckdb_final_state_sql(p, with_sha=True)})
SELECT * FROM final_state WHERE "commit" >= '4' AND "commit" <= 'c'
""".strip()


#: bootstrap fixture: full history WITHOUT truncates (a truncate in the
#: catch-up span would wipe the evidence that catch-up TOAST-'u'/LWW
#: events resolve against the bulk-loaded base) …
P_BOOT = _gen.GenParams(
    n_txns=150, ops_per_txn=8, n_repos=50, n_paths=30,
    toast_pct=30, txns_per_segment=15,
)
#: … and the 105-txn prefix (segments 0-6) that "already exists" in the
#: source database when the replication slot is created
P_BOOT_PREFIX = _gen.GenParams(
    n_txns=105, ops_per_txn=8, n_repos=50, n_paths=30,
    toast_pct=30, txns_per_segment=15,
)


def q_cdc_snapshot_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Initial-snapshot onboarding (Debezium two-phase start): bulk-load
    a consistent snapshot of the source table at the slot's consistent
    LSN (``LakeTable.bootstrap_load``), then catch up from the retained
    WAL — the snapshot/WAL overlap replays as a watermark-pruned no-op,
    and catch-up TOAST-'u' cells resolve against the bulk-loaded base.
    The oracle replays the FULL history serially, so a hash match proves
    snapshot + catch-up converges to exactly the full-replay state."""
    src = _ingest_cdc(spark, P_BOOT_PREFIX, n_batches=2)
    tmp = tempfile.mkdtemp(prefix="pypgoutput_spark_boot_")
    mirror = LakeTable.create(
        spark, f"{tmp}/lake",
        schema=[(c, "string") for c in _gen.ALL_COLUMNS],
        key_cols=list(_gen.KEY_COLUMNS), n_buckets=8,
    )
    mirror.bootstrap_load(src.read(), watermark_lsn=src.watermark_lsn)
    _pipeline.run_ingest(
        spark, _frames_parquet(spark, P_BOOT), mirror, n_batches=2,
        clustered=_frames_clustered(P_BOOT),
    )
    return mirror.read().selectExpr(
        "repo", "path", "`commit`", "lang", "content",
        "sha2(content, 256) AS content_sha",
    )


def _cdc_decoded_events_oracle(p: _gen.GenParams) -> str:
    stride = p.lsn_stride
    return f"""
WITH ev AS ({_gen.duckdb_events_sql(p)})
SELECT lsn, op, repo, path, "commit", lang,
  CASE WHEN content_unchanged THEN NULL ELSE content END AS content,
  content_unchanged,
  1000 + txn AS xid,
  10 + txn * {stride} AS begin_lsn
FROM ev WHERE op IN ('I','U')
""".strip()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full CDC pipeline at small scale (driver checks rows>0)."""
    p = _gen.GenParams(n_txns=40, ops_per_txn=6, txns_per_segment=10)
    return _run_cdc_pipeline(spark, p)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "cdc_pipeline_final_state": q_cdc_pipeline_final_state,
        "cdc_decoded_events": q_cdc_decoded_events,
        "cdc_multi_relation_final_state": q_cdc_multi_relation_final_state,
        "cdc_epoch_consistent_read": q_cdc_epoch_consistent_read,
        "cdc_decoded_events_split": q_cdc_decoded_events_split,
        "cdc_keychange_final_state": q_cdc_keychange_final_state,
        "cdc_streamed_final_state": q_cdc_streamed_final_state,
        "cdc_two_phase_final_state": q_cdc_two_phase_final_state,
        "cdc_streamed_two_phase_final_state": q_cdc_streamed_two_phase_final_state,
        "cdc_origin_filtered_final_state": q_cdc_origin_filtered_final_state,
        "cdc_schema_evolution_final_state": q_cdc_schema_evolution_final_state,
        "cdc_incremental_mview": q_cdc_incremental_mview,
        "cdc_time_travel": q_cdc_time_travel,
        "cdc_point_lookup": q_cdc_point_lookup,
        "cdc_erasure_final_state": q_cdc_erasure_final_state,
        "cdc_zonemap_scan": q_cdc_zonemap_scan,
        "cdc_redaction_final_state": q_cdc_redaction_final_state,
        "cdc_rebucket_final_state": q_cdc_rebucket_final_state,
        "cdc_repair_final_state": q_cdc_repair_final_state,
        "cdc_change_feed": q_cdc_change_feed,
        "cdc_version_diff": q_cdc_version_diff,
        "cdc_scd2_history": q_cdc_scd2_history,
        "cdc_snapshot_bootstrap": q_cdc_snapshot_bootstrap,
    }
    for mod in (_text, _dedup, _similarity, _multimodal, _analytics, _asof,
                _corpus_cdc, _binary_cdc, _sketches, _outbox, _bloomjoin):
        for name, (fn, _sql) in mod.QUERIES.items():
            out[name] = fn
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {
        "cdc_pipeline_final_state": _gen.duckdb_final_state_sql(P_ENTRY, with_sha=True),
        "cdc_decoded_events": _cdc_decoded_events_oracle(P_ENTRY),
        "cdc_multi_relation_final_state": _gen.duckdb_final_state_sql(
            P_MULTI, with_sha=True, with_relation=True
        ),
        "cdc_epoch_consistent_read": _gen.duckdb_final_state_sql(
            P_MULTI, with_sha=True, with_relation=True,
            until_txn=_epoch2_txn_cut(P_MULTI),
        ),
        "cdc_decoded_events_split": _cdc_decoded_events_oracle(P_ENTRY),
        "cdc_keychange_final_state": _gen.duckdb_final_state_sql(
            P_KEYCHANGE, with_sha=True
        ),
        "cdc_streamed_final_state": _gen.duckdb_final_state_sql(
            P_STREAMED, with_sha=True
        ),
        "cdc_two_phase_final_state": _gen.duckdb_final_state_sql(
            P_TWO_PHASE, with_sha=True
        ),
        "cdc_streamed_two_phase_final_state": _gen.duckdb_final_state_sql(
            P_STREAM2PC, with_sha=True
        ),
        "cdc_origin_filtered_final_state": _gen.duckdb_final_state_sql(
            P_ORIGIN, with_sha=True, filter_foreign_origins=True
        ),
        "cdc_schema_evolution_final_state": _gen.duckdb_final_state_sql(
            P_EVOLVE, with_sha=True
        ),
        "cdc_incremental_mview": _cdc_incremental_mview_oracle(P_MVIEW),
        "cdc_time_travel": _gen.duckdb_final_state_sql(
            P_ENTRY_PREFIX, with_sha=True
        ),
        "cdc_point_lookup": _cdc_point_lookup_oracle(P_ENTRY),
        "cdc_erasure_final_state": _cdc_erasure_oracle(P_ENTRY),
        "cdc_zonemap_scan": _cdc_zonemap_oracle(P_ENTRY),
        "cdc_redaction_final_state": _cdc_redaction_oracle(P_ENTRY),
        "cdc_rebucket_final_state": _gen.duckdb_final_state_sql(P_ENTRY, with_sha=True),
        "cdc_repair_final_state": _gen.duckdb_final_state_sql(P_ENTRY, with_sha=True),
        "cdc_change_feed": _cdc_change_feed_oracle(P_FEED, _FEED_BATCHES),
        "cdc_version_diff": _cdc_version_diff_oracle(),
        "cdc_scd2_history": _scd.scd2_oracle_sql(
            _cdc_change_feed_oracle(P_FEED, _FEED_BATCHES),
            ["repo", "path"], ["commit", "lang", "content"],
        ),
        "cdc_snapshot_bootstrap": _gen.duckdb_final_state_sql(P_BOOT, with_sha=True),
    }
    for mod in (_text, _dedup, _similarity, _multimodal, _analytics, _asof,
                _corpus_cdc, _binary_cdc, _sketches, _outbox, _bloomjoin):
        for name, (_fn, sql) in mod.QUERIES.items():
            if sql is not None:
                out[name] = sql
    return out
