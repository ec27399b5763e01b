"""Crash-soak child: run the streaming ingest over a frames directory,
optionally dying hard (os._exit — the SIGKILL analog) at a named commit
point (PYPGOUT_CRASH_POINT env, see lake.table._maybe_crash):

  pre_snapshot:N   before the Nth snapshot JSON write (data staged only)
  pre_publish:N    after snapshot write, before the CURRENT rename
  post_publish:N   after CURRENT rename, before Spark's checkpoint commit

The parent (tests/test_crash_resume.py) relaunches until a clean exit and
asserts exactly-once: final state ≡ serial oracle, watermarks strictly
monotone, no duplicate or lost batches. This is the adversarial proof of
the reference's ack protocol contract (reader.py:374-390) on the lake's
watermark-atomic commit.

Usage: python tools/crash_child.py FRAMES_DIR LAKE_DIR CKPT_DIR
"""

from __future__ import annotations

import os
import sys


def main(argv) -> int:
    sys.path.insert(0, ".")
    frames_dir, lake_dir, ckpt_dir = argv[1:4]

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
    q = pipeline.stream_ingest(
        spark, frames_dir, table, ckpt_dir, max_files_per_trigger=1
    )
    q.awaitTermination(600)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
