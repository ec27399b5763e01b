"""Compaction crash-soak child: batch-ingest a frames directory while a
compaction runs CONCURRENTLY on the maintenance thread, optionally dying
hard (os._exit — the SIGKILL analog) inside the fold:

  post_compact_stage:N  the fold's new base is fully staged on disk but
                        referenced by NO snapshot (before the fold
                        commit's conflict checks and publish)

The parent (tests/test_crash_resume.py) relaunches until a clean exit
and asserts: final state ≡ serial oracle (the half-staged fold changed
nothing), exactly-once ingest held across the crash, and
expire_snapshots reclaims the orphaned staging.

Usage: python tools/crash_compact_child.py FRAMES_DIR LAKE_DIR
"""

from __future__ import annotations

import os
import sys


def main(argv) -> int:
    sys.path.insert(0, ".")
    frames_dir, lake_dir = argv[1:3]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    from pypgoutput_spark.lake.table import LakeTable
    from pypgoutput_spark.streaming import pipeline
    from pypgoutput_spark.wal import generator as gen

    if os.path.exists(os.path.join(lake_dir, "_meta", "CURRENT")):
        table = LakeTable(spark, lake_dir)
    else:
        table = LakeTable.create(
            spark, lake_dir,
            schema=[(c, "string") for c in gen.ALL_COLUMNS],
            key_cols=list(gen.KEY_COLUMNS), n_buckets=8,
        )
    frames = spark.read.parquet(frames_dir)

    # kick a full-table compaction onto the maintenance thread after the
    # first batch commits, while later batches keep ingesting — the
    # crash point (if armed) fires inside the concurrent fold
    state = {"kicked": False}

    def on_batch(metrics: dict) -> None:
        if not state["kicked"]:
            state["kicked"] = True
            table.schedule_compact()

    pipeline.run_ingest(
        spark, frames, table, n_batches=4, split="segment", on_batch=on_batch
    )
    table.wait_maintenance()
    # a conflict-aborted (or crashed-and-relaunched) fold leaves dirty
    # buckets behind; fold them now so the clean run ends compacted
    table.compact()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
