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
from pypgoutput_spark.operators.lww import lww_changes, truncate_barrier
from pypgoutput_spark.operators.merge import merge_into
from pypgoutput_spark.plans.registry import RelationRegistry
from pypgoutput_spark.wal.generator import RELATION_ID


def apply_events_batch(
    table: LakeTable,
    events,
    relation_id: int = RELATION_ID,
    watermark_lsn: Optional[int] = None,
    salt_buckets: int = 0,
) -> dict:
    """Decode-output events (one relation) → LWW → merge. Returns metrics."""
    snap = table.snapshot()
    keys = snap["key_cols"]
    value_cols = [n for n, _ in snap["schema"] if n not in keys]

    rel_events = events.filter(F.col("relation_id") == relation_id)
    eff, truncated = truncate_barrier(rel_events, relation_id)
    if watermark_lsn is None:
        watermark_lsn = (
            rel_events.agg(F.max("lsn").alias("m")).collect()[0]["m"] or -1
        )
    changes = lww_changes(eff, keys, value_cols, salt_buckets=salt_buckets)
    return merge_into(table, changes, watermark_lsn, truncate=truncated)


def run_ingest(
    spark,
    frames,
    table: LakeTable,
    relation_id: int = RELATION_ID,
    n_batches: int = 1,
    salt_buckets: int = 0,
    strict: bool = True,
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
        events = decode_op.decode_frames(batch_frames, registry, strict=strict)
        metrics = apply_events_batch(
            table, events, relation_id, salt_buckets=salt_buckets
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
    """
    frames_stream = (
        spark.readStream.schema("segment BIGINT, lsn BIGINT, payload BINARY")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(frames_dir)
    )
    # registry from the static view of the same directory (R frames precede
    # DML in WAL order; for a fixed publication they exist from the start)
    static = spark.read.schema("segment BIGINT, lsn BIGINT, payload BINARY").parquet(frames_dir)
    registry = RelationRegistry.from_frames(static)

    def _apply(batch_df, batch_id: int) -> None:
        events = decode_op.decode_frames(batch_df, registry, strict=False)
        apply_events_batch(table, events, relation_id)

    return (
        frames_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
