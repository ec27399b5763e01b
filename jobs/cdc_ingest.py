#!/usr/bin/env python
"""spark-submit entry point for the CDC ingest engine.

The north rule runs the engine "via spark-submit --py-files on a
multi-executor cluster"; this is that job script. Package the library
once and submit (cluster size/config comes from spark-submit, the job
never hard-codes a master):

    (cd <repo> && zip -qr /tmp/pypgoutput_spark.zip pypgoutput_spark)
    spark-submit --py-files /tmp/pypgoutput_spark.zip \\
        jobs/cdc_ingest.py \\
        --frames-dir /data/wal_frames --lake-root /lake/cdc \\
        --mode batch --n-batches 8

Slot bootstrap (reference reader.py create_publication/slot analog):
the stream's own Relation frames declare every table — column names and
types from the pgoutput type OIDs, keys from ``part_of_pkey`` — so the
job creates one LakeTable per announced relation on first run (from the
FIRST Relation version; later R-frame diffs evolve the schema mid-replay
exactly as they would mid-stream) and re-opens existing tables on
resubmit. Exactly-once holds across reruns: frames at or below each
table's committed watermark are skipped idempotently, so the job is
safe to rerun after any crash or partial failure.

``--mode stream`` runs the Structured-Streaming ingester over the same
frames directory (availableNow by default, ``--trigger-seconds`` for a
continuous micro-batch loop); the stream checkpoint lives under the
lake root unless ``--checkpoint-dir`` overrides it.

The job's last stdout line is one JSON object (per-table final version,
watermark LSN, applied/deleted counters, wall seconds) for the
submitting orchestrator to parse.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    ap.add_argument("--frames-dir", required=True,
                    help="parquet WAL-frame directory (segment, lsn, mtype, payload)")
    ap.add_argument("--lake-root", required=True,
                    help="root directory; one LakeTable per relation underneath")
    ap.add_argument("--mode", choices=("batch", "stream"), default="batch")
    ap.add_argument("--n-batches", type=int, default=1,
                    help="batch mode: micro-batch count (segment-boundary cuts)")
    ap.add_argument("--n-buckets", type=int, default=16,
                    help="hash-bucket count for tables created by this run")
    ap.add_argument("--salt-buckets", type=int, default=0,
                    help="salt the LWW pre-aggregate for hot-key skew (0 = off)")
    ap.add_argument("--kc-toast-passes", type=int, default=0,
                    help="bounded key-change+TOAST resolver passes (0 = guard)")
    ap.add_argument("--strict", dest="strict", action="store_true", default=True)
    ap.add_argument("--no-strict", dest="strict", action="store_false",
                    help="dead-letter undecodable messages instead of failing")
    ap.add_argument("--quarantine-dir", default=None,
                    help="with --no-strict: parquet sink for dead-letter rows")
    ap.add_argument("--clustered", action="store_true",
                    help="frame files hold whole segments: skip the decode shuffle")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="stream mode: checkpoint location (default <lake-root>/_checkpoint)")
    ap.add_argument("--trigger-seconds", type=float, default=None,
                    help="stream mode: processingTime trigger; default availableNow")
    ap.add_argument("--epoch-log", action="store_true",
                    help="publish one cross-table consistency epoch per batch")
    ap.add_argument("--stream-spill-mb", type=int, default=None,
                    help="spill oversized protocol-v2 streamed transactions "
                         "to executor-local disk past this many MB of "
                         "buffered Arrow bytes (bounded-memory decode; "
                         "default: buffer in memory)")
    return ap


def bootstrap_tables(spark, frames, lake_root: str, n_buckets: int):
    """Create-or-open one LakeTable per relation announced in ``frames``."""
    from pypgoutput_spark.lake.table import LakeTable
    from pypgoutput_spark.plans.registry import RelationRegistry

    registry = RelationRegistry.from_frames(frames)
    if not registry.relation_ids():
        raise SystemExit("no Relation frames in --frames-dir; nothing to bootstrap")
    tables = {}
    for rid in registry.relation_ids():
        first = registry.versions(rid)[0]
        name = f"{first.namespace}.{first.name}".strip(".") or f"rel_{rid}"
        path = os.path.join(lake_root, name)
        if os.path.isdir(os.path.join(path, "_meta")):
            tables[rid] = LakeTable(spark, path)
        else:
            if not first.key_columns:
                raise SystemExit(
                    f"relation {rid} ({name}) declares no key columns "
                    "(REPLICA IDENTITY); cannot create an upsert table"
                )
            tables[rid] = LakeTable.create(
                spark, path,
                schema=first.spark_fields(),
                key_cols=list(first.key_columns),
                n_buckets=n_buckets,
            )
    return tables


def main(argv=None) -> None:
    args = _build_parser().parse_args(argv)
    from pyspark.sql import SparkSession

    from pypgoutput_spark.lake.epochs import EpochLog
    from pypgoutput_spark.streaming import pipeline

    # master/executors/memory come from spark-submit — never set here
    spark = SparkSession.builder.appName("pypgoutput-spark-cdc-ingest").getOrCreate()
    t0 = time.time()

    frames = spark.read.parquet(args.frames_dir)
    tables = bootstrap_tables(spark, frames, args.lake_root, args.n_buckets)
    epoch_log = (
        EpochLog(os.path.join(args.lake_root, "_epochs")) if args.epoch_log else None
    )

    spill_bytes = (
        args.stream_spill_mb * (1 << 20)
        if args.stream_spill_mb is not None else None
    )
    if args.mode == "batch":
        pipeline.run_ingest(
            spark, frames, tables,
            n_batches=args.n_batches,
            salt_buckets=args.salt_buckets,
            strict=args.strict,
            clustered=args.clustered,
            quarantine_dir=args.quarantine_dir,
            kc_toast_passes=args.kc_toast_passes,
            epoch_log=epoch_log,
            stream_spill_bytes=spill_bytes,
        )
    else:
        trigger = (
            {"processingTime": f"{args.trigger_seconds} seconds"}
            if args.trigger_seconds
            else {"availableNow": True}
        )
        q = pipeline.stream_ingest(
            spark, args.frames_dir, tables,
            checkpoint_dir=args.checkpoint_dir
            or os.path.join(args.lake_root, "_checkpoint"),
            trigger=trigger,
            quarantine_dir=args.quarantine_dir,
            kc_toast_passes=args.kc_toast_passes,
            clustered=args.clustered,
            epoch_log=epoch_log,
            stream_spill_bytes=spill_bytes,
        )
        q.awaitTermination()

    report = {"mode": args.mode, "wall_sec": round(time.time() - t0, 3), "tables": {}}
    for rid, table in sorted(tables.items()):
        snap = table.snapshot()
        report["tables"][str(rid)] = {
            "path": table.path,
            "version": snap["version"],
            "watermark_lsn": snap["watermark_lsn"],
            "metrics": snap.get("metrics", {}),
        }
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
