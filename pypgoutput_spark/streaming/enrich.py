"""Stream enrichment against the live CDC mirror (stream-static join,
snapshot re-resolved per micro-batch).

The serving composition the whole pipeline exists for: an unbounded
event stream joins a dimension table that is itself CDC-maintained (a
LakeTable kept current by the ingest pipeline). Spark's stream-static
join fixes the static plan at query start, which would freeze the
dimension at its stream-start snapshot; this operator instead drives
the join through ``foreachBatch``, calling ``LakeTable.read()`` (or
``lookup()``) inside the batch function — each micro-batch re-resolves
CURRENT, so dimension updates committed between batches are visible to
the next batch, with snapshot isolation within a batch.

Scale: the per-batch dimension read is the normal lake read — clean
buckets scan, dirty buckets resolve exchange-free — and the join
broadcasts the batch side when small (the common case: one micro-batch
of events vs a large dimension means the join should instead use
``lookup_keys=True``, which bucket-prunes the dimension to the batch's
key cohort first: dimension I/O ∝ batch keys, not dimension size).

Pinned by tests/test_streaming_enrich.py: each batch's output reflects
exactly the dimension state committed before that batch (no frozen
plan, no torn mid-batch reads).
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import functions as F


def enrich_stream(events_stream, table, on: str, out_dir: str,
                  select: Optional[list] = None,
                  lookup_keys: bool = True,
                  on_batch: Optional[Callable[[int], None]] = None):
    """Start a streaming query writing enriched events to ``out_dir``
    (parquet). ``on``: the equi-join column (the dimension's key).
    ``lookup_keys=True`` prunes the dimension read to the batch's key
    cohort via :meth:`LakeTable.lookup` semantics. ``on_batch(batch_id)``
    runs AFTER each batch lands (test seam / maintenance hook).
    Left join: events with no dimension row pass through NULL-extended.
    Returns the StreamingQuery."""

    def _apply(batch_df, batch_id: int) -> None:
        if lookup_keys:
            probe = batch_df.select(on).distinct()
            dim = table.lookup(probe)
        else:
            dim = table.read()
        out = batch_df.join(dim, on=on, how="left")
        if select:
            out = out.selectExpr(*select)
        # idempotent sink: the parquet write lands BEFORE the checkpoint
        # commits the batch, so a crash between them replays the batch —
        # dynamic partition-overwrite on _batch_id replaces the earlier
        # attempt's rows instead of duplicating them. (A replayed batch
        # re-resolves the dimension at replay time: enrichment is
        # at-least-once against the LATEST dimension, the standard
        # foreachBatch contract.)
        (
            out.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_dir)
        )
        if on_batch is not None:
            on_batch(batch_id)

    return (
        events_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", out_dir + "_ckpt")
        .trigger(availableNow=True)
        .start()
    )
