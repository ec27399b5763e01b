#!/usr/bin/env python
"""Streaming-vs-batch ingest throughput.

Round-2 VERDICT item 2 asked for evidence that `stream_ingest` no longer
pays the 5.8x loop-kernel tax on clean data (it now decodes
vectorized-first with per-Arrow-batch fallback, operators/decode.py).
This runs the SAME pre-generated frame files through

  1. one warm batch `run_ingest` (single micro-batch), and
  2. `stream_ingest` (Structured Streaming file source, availableNow,
     maxFilesPerTrigger cutting the input into ~8 micro-batches),

and prints one JSON line with both throughputs and the streaming/batch
ratio. Streaming pays real per-micro-batch costs (8 snapshot commits vs
1, foreachBatch planning, file-source bookkeeping), so the ratio is
expected < 1 but same-order; before the round-3 change the decode alone
made it ~5x slower on the dominant phase.

    SPARK_GRAFT_STREAM_EVENTS=4000000 SPARK_GRAFT_CPUS=8 \
        python tools/bench_streaming.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _mk_spark, scaling_params  # noqa: E402


def main() -> None:
    from pypgoutput_spark.lake.table import LakeTable
    from pypgoutput_spark.streaming import pipeline
    from pypgoutput_spark.wal import generator as gen

    n_events = int(os.environ.get("SPARK_GRAFT_STREAM_EVENTS", "4000000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    # 64 files / 8 per trigger = 8 micro-batches of 8 partitions each —
    # clustered decode parallelism matches the local[8] default
    n_files = int(os.environ.get("SPARK_GRAFT_STREAM_FILES", "64"))
    files_per_trigger = int(os.environ.get("SPARK_GRAFT_STREAM_FPT", "8"))

    spark = _mk_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        # The streaming source contract is MONOTONE file delivery (a WAL
        # shipper ships segments in LSN order; stream_ingest treats frames
        # at or below the committed watermark as replays and skips them).
        # So stage the generated frames once, then materialize n_files
        # chunk files sequentially in segment order — file mtimes then
        # increase with LSN, matching FileStreamSource's processing order.
        staging = os.path.join(tmp, "staging")
        gen.spark_frames_df(spark, scaling_params(n_events), n_partitions=n_files).write.parquet(
            staging
        )
        staged = spark.read.parquet(staging)
        n_change = staged.filter("mtype IN ('I','U','D','T')").count()
        n_segments = staged.agg({"segment": "max"}).collect()[0][0] + 1
        frames_dir = os.path.join(tmp, "frames")
        per_chunk = (n_segments + n_files - 1) // n_files
        for i in range(n_files):
            chunk = staged.filter(
                (staged.segment >= i * per_chunk) & (staged.segment < (i + 1) * per_chunk)
            )
            chunk.coalesce(1).write.mode("append").parquet(frames_dir)
        frames = spark.read.parquet(frames_dir)

        def mk_table(name: str) -> LakeTable:
            return LakeTable.create(
                spark, os.path.join(tmp, name),
                schema=[(c, "string") for c in gen.ALL_COLUMNS],
                key_cols=list(gen.KEY_COLUMNS), n_buckets=32,
            )

        # warm-up: pay Python-worker fork / Arrow init / codegen once
        pipeline.run_ingest(
            spark,
            gen.spark_frames_df(spark, gen.GenParams(n_txns=40, ops_per_txn=5)),
            mk_table("warm"),
        )

        batch_table = mk_table("batch")
        t0 = time.monotonic()
        pipeline.run_ingest(spark, frames, batch_table, clustered=True)
        batch_wall = time.monotonic() - t0

        stream_table = mk_table("stream")
        t0 = time.monotonic()
        q = pipeline.stream_ingest(
            spark, frames_dir, stream_table, os.path.join(tmp, "ckpt"),
            max_files_per_trigger=files_per_trigger,
            clustered=True,  # chunk files hold whole segments by construction
        )
        q.awaitTermination()
        stream_wall = time.monotonic() - t0

        rows_batch = batch_table.read().count()
        rows_stream = stream_table.read().count()
        assert rows_batch == rows_stream, (rows_batch, rows_stream)

        print(json.dumps({
            "cpus": cpus,
            "n_change_events": n_change,
            "micro_batches": (n_files + files_per_trigger - 1) // files_per_trigger,
            "batch_wall_sec": round(batch_wall, 2),
            "batch_events_per_sec": round(n_change / batch_wall, 1),
            "stream_wall_sec": round(stream_wall, 2),
            "stream_events_per_sec": round(n_change / stream_wall, 1),
            "stream_over_batch": round(batch_wall / stream_wall, 3),
            "final_rows": rows_batch,
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
