"""Rebucket crash-soak child: batch-ingest a frames directory, then
rebucket the table to a larger hash-bucket count, optionally dying hard
(os._exit — the SIGKILL analog) with the new layout fully staged:

  post_rebucket_stage:N  every row is restaged on disk under the new
                         bucket count but referenced by NO snapshot
                         (before the rebucket commit's head check and
                         publish)

The parent (tests/test_crash_resume.py) relaunches until a clean exit
and asserts: final state ≡ serial oracle under the NEW layout,
exactly-once ingest held across the crash, and expire_snapshots
reclaims the crashed rewrite's orphaned staging.

Usage: python tools/crash_rebucket_child.py FRAMES_DIR LAKE_DIR NEW_N
"""

from __future__ import annotations

import os
import sys


def main(argv) -> int:
    sys.path.insert(0, ".")
    frames_dir, lake_dir, new_n = argv[1], argv[2], int(argv[3])

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
            key_cols=list(gen.KEY_COLUMNS), n_buckets=4,
        )
    frames = spark.read.parquet(frames_dir)
    pipeline.run_ingest(spark, frames, table, n_batches=2, split="segment")
    table.rebucket(new_n)  # crash point (if armed) fires post-stage
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
