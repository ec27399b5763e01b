"""End-to-end CDC ingest pipeline: WAL frames → decoded events → merge.

Micro-batch driver (the distributed analog of the reference's
``LogicalReplicationReader`` loop, reference reader.py:112-193): frames
are consumed in LSN-ordered batches of whole WAL segments; each batch is
decoded, truncate-barriered, LWW-collapsed, and merged into the LakeTable
with the batch's max LSN committed atomically as the new watermark.

Resume-from-checkpoint: the table's ``watermark_lsn`` IS the checkpoint.
On restart, frames with lsn ≤ watermark are filtered out before decode
(predicate pushed to the frame scan); a partially-applied batch that
crashed before its snapshot commit re-runs idempotently. Relation ('R')
frames are exempt from the filter — the schema registry is always rebuilt
from the full R cohort (a handful of frames), which reconstructs the
reference's in-memory schema cache on resume (reader.py:124-132).

A Structured Streaming variant (`stream_ingest`) wires the same batch
apply through ``foreachBatch`` over a file-source stream.
"""

from __future__ import annotations

import math
from typing import Callable, List, Optional

from pyspark.sql import functions as F

from pypgoutput_spark.lake.table import LakeTable
from pypgoutput_spark.operators import decode as decode_op
from pypgoutput_spark.operators.lww import lww_changes_flat
from pypgoutput_spark.operators.merge import merge_into
from pypgoutput_spark.plans.registry import RelationRegistry
from pypgoutput_spark.wal.generator import RELATION_ID


def evolve_to_relation(table: LakeTable, rv, key_cols) -> bool:
    """Diff the table schema against a RelationVersion and apply add/drop
    actions (key columns are never dropped). Returns True if evolved."""
    from pypgoutput_spark.plans.registry import SchemaAction
    from pypgoutput_spark.wal import codec as _codec

    current = {n: t for n, t in table.snapshot()["schema"]}
    target = {
        c[1]: _codec.spark_type_for_oid(c[2], c[3]) for c in rv.columns
    }
    actions = []
    for name, typ in target.items():
        if name not in current:
            actions.append(SchemaAction("add", name, typ))
    for name in current:
        if name not in target and name not in key_cols:
            actions.append(SchemaAction("drop", name))
    if actions:
        table.evolve_schema(actions)
    return bool(actions)


def apply_frames_batch(
    table: LakeTable,
    frames,
    registry: Optional[RelationRegistry] = None,
    relation_id: int = RELATION_ID,
    salt_buckets: int = 0,
    strict: bool = True,
    clustered: bool = False,
) -> dict:
    """One micro-batch: frames → decode → LWW → merge. Returns metrics.

    Batch stats (watermark candidate + truncate-barrier LSN) come from the
    frame *metadata* columns — a scan that prunes the payload entirely
    when the source stamps ``mtype`` — so the expensive decode runs
    exactly once, streaming straight into the LWW aggregation (which is
    itself a partial-combining groupBy: decoded events are never
    materialized or cached).
    """
    snap = table.snapshot()
    keys = snap["key_cols"]
    value_cols = [n for n, _ in snap["schema"] if n not in keys]

    has_mtype = "mtype" in frames.columns
    t_pred = (
        F.col("mtype") == "T"
        if has_mtype
        else F.expr("substring(payload, 1, 1) = X'54'")
    )
    stats = frames.agg(
        F.max("lsn").alias("max_lsn"),
        F.min("lsn").alias("min_lsn"),
        F.max(F.when(t_pred, F.col("lsn"))).alias("t_lsn"),
        F.min("segment").alias("seg_lo"),
        F.max("segment").alias("seg_hi"),
        F.count("*").alias("n_frames"),
    ).collect()[0]
    if stats["max_lsn"] is None:
        return {"skipped": True, "reason": "empty", "watermark_lsn": table.watermark_lsn}
    watermark_lsn = stats["max_lsn"]
    truncated = stats["t_lsn"] is not None
    lineage = {
        "lsn_range": [stats["min_lsn"], stats["max_lsn"]],
        "segment_range": [stats["seg_lo"], stats["seg_hi"]],
        "n_frames": stats["n_frames"],
    }

    eff_frames = frames
    if truncated and has_mtype:
        # drop dead DML frames below the barrier before decode; keep all
        # B/C/R frames (a post-barrier event's Begin may precede the barrier)
        eff_frames = frames.filter(
            ~F.col("mtype").isin("I", "U", "D")
            | (F.col("lsn") > F.lit(stats["t_lsn"]))
        )

    if registry is None:
        registry = RelationRegistry.from_frames(frames)
    versions = registry.versions(relation_id)
    if not versions:
        return {"skipped": True, "reason": "no-relation", "watermark_lsn": table.watermark_lsn}

    # stream-driven schema evolution (last-Relation-wins, reference
    # reader.py:222-243): align the table schema to the newest Relation
    # version before merging — adds/drops are metadata-only commits
    latest = versions[-1]
    evolved = evolve_to_relation(table, latest, keys)
    if evolved:
        snap = table.snapshot()
        value_cols = [n for n, _ in snap["schema"] if n not in keys]

    raw = decode_op.decode_frames_raw(eff_frames, registry, strict=strict, clustered=clustered)
    # project every schema version present in the stream, aligned to the
    # table's current columns (missing columns → NULL, not-unchanged)
    parts = []
    base_cols = ["lsn", "op", "xid", "begin_lsn", "commit_ts_us"]
    for rv in versions:
        p_df = decode_op.project_relation(raw, rv)
        sel = list(base_cols)
        for c in list(keys) + value_cols:
            if c in rv.column_names:
                sel += [f"`{c}`", f"u_{c}"]
            else:
                sel += [f"CAST(NULL AS STRING) AS `{c}`", f"false AS u_{c}"]
        parts.append(p_df.selectExpr(*sel))
    proj = parts[0]
    for extra in parts[1:]:
        proj = proj.unionByName(extra)
    proj = proj.filter(F.col("op") != "T")
    if truncated:
        proj = proj.filter(F.col("lsn") > stats["t_lsn"])
    changes = lww_changes_flat(proj, keys, value_cols, salt_buckets=salt_buckets)
    return merge_into(
        table, changes, watermark_lsn, truncate=truncated,
        extra_metrics={"lineage": lineage},
    )


def run_ingest(
    spark,
    frames,
    table: LakeTable,
    relation_id: int = RELATION_ID,
    n_batches: int = 1,
    salt_buckets: int = 0,
    strict: bool = True,
    clustered: bool = False,
    on_batch: Optional[Callable[[dict], None]] = None,
) -> List[dict]:
    """Replay a frames DataFrame into the table in ``n_batches`` micro-batches
    split on WAL-segment boundaries (transactions never straddle segments).

    Exactly-once: frames at or below the table watermark are skipped.
    """
    registry = RelationRegistry.from_frames(frames)  # full R cohort, resume-safe
    watermark = table.watermark_lsn
    if watermark >= 0:
        frames = frames.filter(F.col("lsn") > watermark)

    if n_batches <= 1:
        batches = [frames]
    else:
        bounds = frames.agg(
            F.min("segment").alias("lo"), F.max("segment").alias("hi")
        ).collect()[0]
        if bounds["lo"] is None:
            return []
        lo, hi = int(bounds["lo"]), int(bounds["hi"])
        span = max(1, math.ceil((hi - lo + 1) / n_batches))
        batches = [
            frames.filter(
                (F.col("segment") >= lo + i * span)
                & (F.col("segment") < lo + (i + 1) * span)
            )
            for i in range(n_batches)
            if lo + i * span <= hi
        ]

    out = []
    for batch_frames in batches:
        metrics = apply_frames_batch(
            table, batch_frames, registry, relation_id,
            salt_buckets=salt_buckets, strict=strict, clustered=clustered,
        )
        out.append(metrics)
        if on_batch:
            on_batch(metrics)
    return out


def stream_ingest(
    spark,
    frames_dir: str,
    table: LakeTable,
    checkpoint_dir: str,
    relation_id: int = RELATION_ID,
    max_files_per_trigger: int = 8,
):
    """Structured-Streaming variant: parquet frame files → foreachBatch merge.

    The lake commit is idempotent on watermark_lsn, so together with the
    stream checkpoint this is exactly-once end-to-end. Returns the
    StreamingQuery (caller awaits/stops).

    Delivery contract: frame files must land in LSN-monotone order (a WAL
    tail naturally does — the receiver rolls files as the LSN advances;
    the file source processes oldest-first). The watermark guard treats a
    batch whose max LSN is at or below the table watermark as already
    applied, which is only correct under monotone delivery.
    """
    from pypgoutput_spark.wal.generator import FRAMES_SCHEMA

    frames_stream = (
        spark.readStream.schema(FRAMES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(frames_dir)
    )
    # registry from the static view of the same directory (R frames precede
    # DML in WAL order; for a fixed publication they exist from the start)
    static = spark.read.schema(FRAMES_SCHEMA).parquet(frames_dir)
    registry = RelationRegistry.from_frames(static)

    def _apply(batch_df, batch_id: int) -> None:
        apply_frames_batch(table, batch_df, registry, relation_id, strict=False)

    return (
        frames_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
