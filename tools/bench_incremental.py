#!/usr/bin/env python
"""Incremental-merge bench: MOR delta appends vs copy-on-write rewrites.

Loads an N-row table (default 8M), then applies successive uniform
100k-key change batches — the adversarial case for copy-on-write
(uniformly hashed keys touch EVERY bucket, so COW rewrites the whole
table per batch). Reports per-batch wall for merge-on-read (default
mode) and, for comparison, a few copy-on-write batches.

    python tools/bench_incremental.py
    SPARK_GRAFT_ROWS=2000000 SPARK_GRAFT_BATCHES=6 python tools/bench_incremental.py

Prints one JSON line; recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def changes_df(spark, n: int, key_space: int, salt: int):
    """LWW-shaped change set of n uniform random keys (updates to col a;
    col b carries no info → read-time fallback)."""
    return spark.range(n).selectExpr(
        f"concat('k', CAST(xxhash64(id + {salt}) % {key_space} AS STRING)) AS k",
        "'U' AS final_op",
        f"CAST({salt} * 1000000 + id AS BIGINT) AS max_lsn",
        f"named_struct('v', concat('a', CAST(id AS STRING))) AS r_a",
        "CAST(NULL AS STRUCT<v: STRING>) AS r_b",
    ).groupBy("k").agg(
        F.expr("max_by(final_op, max_lsn) AS final_op"),
        F.expr("max(max_lsn) AS max_lsn"),
        F.expr("max_by(r_a, max_lsn) AS r_a"),
        F.expr("max_by(r_b, max_lsn) AS r_b"),
    )


def main() -> None:
    from pyspark.sql import SparkSession

    from pypgoutput_spark.lake.table import LakeTable
    from pypgoutput_spark.operators.merge import merge_into

    rows = int(os.environ.get("SPARK_GRAFT_ROWS", "8000000"))
    batch = int(os.environ.get("SPARK_GRAFT_BATCH", "100000"))
    n_batches = int(os.environ.get("SPARK_GRAFT_BATCHES", "10"))
    cow_batches = int(os.environ.get("SPARK_GRAFT_COW_BATCHES", "3"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(64, cpus * 4)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="bench_mor_")
    try:
        table = LakeTable.create(
            spark, os.path.join(tmp, "lake"),
            schema=[("k", "string"), ("a", "string"), ("b", "string")],
            key_cols=["k"], n_buckets=64,
        )
        load = spark.range(rows).selectExpr(
            "concat('k', CAST(id AS STRING)) AS k", "'I' AS final_op",
            "CAST(id AS BIGINT) AS max_lsn",
            "named_struct('v', concat('a', CAST(id AS STRING))) AS r_a",
            "named_struct('v', concat('b', CAST(id AS STRING))) AS r_b",
        )
        t0 = time.monotonic()
        merge_into(table, load, watermark_lsn=rows)
        load_wall = time.monotonic() - t0

        mor_walls = []
        for i in range(n_batches):
            ch = changes_df(spark, batch, rows, salt=i + 1)
            t0 = time.monotonic()
            m = merge_into(table, ch, watermark_lsn=rows + (i + 1) * 1_000_000,
                           auto_compact=False)
            mor_walls.append(round(time.monotonic() - t0, 2))
            assert m["mode"] == "mor", m

        # read path over all accumulated deltas: default exchange-free
        # per-bucket resolution vs the shuffle-aggregate plan
        t0 = time.monotonic()
        n_final = table.read().count()
        read_wall = round(time.monotonic() - t0, 2)
        t0 = time.monotonic()
        n_shuffle = table.read(resolve="shuffle").count()
        read_wall_shuffle = round(time.monotonic() - t0, 2)
        assert n_final == n_shuffle
        t0 = time.monotonic()
        table.compact()
        compact_wall = round(time.monotonic() - t0, 2)
        t0 = time.monotonic()
        n_compacted = table.read().count()
        read_after = round(time.monotonic() - t0, 2)
        assert n_final == n_compacted

        # async-compaction window (round-4): keep ingesting while the
        # maintenance thread folds the accumulating deltas — per-batch
        # ingest wall must stay flat THROUGH the triggered rewrite
        async_walls = []
        for i in range(n_batches):
            ch = changes_df(spark, batch, rows, salt=50 + i)
            t0 = time.monotonic()
            merge_into(table, ch, watermark_lsn=rows + (50 + i + 1) * 1_000_000,
                       auto_compact=False)
            async_walls.append(round(time.monotonic() - t0, 2))
            if i == 1:
                table.schedule_compact()  # full-table fold starts NOW
        n_after_async = table.read().count()
        t0 = time.monotonic()
        table.wait_maintenance()
        compact_drain = round(time.monotonic() - t0, 2)
        # compaction is state-neutral even when it raced the ingest loop
        assert table.read().count() == n_after_async

        cow_walls = []
        for i in range(cow_batches):
            ch = changes_df(spark, batch, rows, salt=100 + i)
            t0 = time.monotonic()
            merge_into(table, ch, watermark_lsn=rows + (100 + i + 1) * 1_000_000,
                       mode="cow")
            cow_walls.append(round(time.monotonic() - t0, 2))

        print(json.dumps({
            "rows": rows, "batch_keys": batch, "cpus": cpus,
            "initial_load_sec": round(load_wall, 2),
            "mor_batch_walls": mor_walls,
            "mor_flatness_last_over_first": round(mor_walls[-1] / mor_walls[0], 2),
            "read_over_deltas_sec": read_wall,
            "read_over_deltas_shuffle_sec": read_wall_shuffle,
            "compact_sec": compact_wall,
            "read_after_compact_sec": read_after,
            "async_batch_walls_during_compaction": async_walls,
            "async_flatness_max_over_median": round(
                max(async_walls) / sorted(async_walls)[len(async_walls) // 2], 2),
            "async_compact_drain_sec": compact_drain,
            "cow_batch_walls": cow_walls,
            "cow_over_mor_median": round(
                sorted(cow_walls)[len(cow_walls) // 2]
                / sorted(mor_walls)[len(mor_walls) // 2], 1),
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
