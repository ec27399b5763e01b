#!/usr/bin/env python
"""Phase-level profiling of the expensive CDC bench entries (guide §1):
time the fixture encode, frame materialization, each ingest batch, and
the final read separately, so optimization targets the real cost.

    python tools/profile_phases.py [pipeline|twophase|binary|docs|...]
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.monotonic()
_last = [T0]


def mark(label: str) -> None:
    now = time.monotonic()
    print(f"[{now - T0:8.2f}s] +{now - _last[0]:6.2f}s  {label}", flush=True)
    _last[0] = now


def mk_spark():
    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = int(os.environ.get("SPARK_GRAFT_SHUFFLE", max(64, cpus * 8)))
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile-phases")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )


def ingest_profiled(spark, p, n_batches=3, **kw):
    import __spark_entry__ as E
    from pypgoutput_spark.lake.table import LakeTable
    from pypgoutput_spark.streaming import pipeline as _pipeline
    from pypgoutput_spark.wal import generator as _gen

    tmp = tempfile.mkdtemp(prefix="prof_lake_")
    table = LakeTable.create(
        spark, f"{tmp}/lake",
        schema=[(c, "string") for c in _gen.ALL_COLUMNS],
        key_cols=list(_gen.KEY_COLUMNS), n_buckets=8,
    )
    mark("table created")
    frames = E._frames_parquet(spark, p)
    mark("frames materialized (parquet)")
    out = _pipeline.run_ingest(
        spark, frames, table, n_batches=n_batches, clustered=True,
        on_batch=lambda m: mark(f"batch done: {m.get('reason') or m.get('mode')}"),
        **kw,
    )
    mark("run_ingest done")
    df = table.read().selectExpr(
        "repo", "path", "`commit`", "lang", "content",
        "sha2(content, 256) AS content_sha",
    )
    df.write.format("noop").mode("overwrite").save()
    mark("final read + noop")
    return out


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "pipeline"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = mk_spark()
    spark.sparkContext.setLogLevel("ERROR")
    mark("spark up")
    import __spark_entry__ as E

    # warm the python-worker / codegen paths like bench.py does
    from pypgoutput_spark.lake.table import LakeTable
    from pypgoutput_spark.streaming import pipeline as _pipeline
    from pypgoutput_spark.wal import generator as _gen

    tmp = tempfile.mkdtemp(prefix="prof_warm_")
    warm = LakeTable.create(
        spark, f"{tmp}/warm",
        schema=[(c, "string") for c in _gen.ALL_COLUMNS],
        key_cols=list(_gen.KEY_COLUMNS), n_buckets=8,
    )
    _pipeline.run_ingest(
        spark, _gen.spark_frames_df(spark, _gen.GenParams(n_txns=40, ops_per_txn=5)), warm
    )
    mark("warmup ingest done")

    if which == "pipeline":
        ingest_profiled(spark, E.P_ENTRY)
    elif which == "twophase":
        ingest_profiled(spark, E.P_TWO_PHASE)
    elif which == "stream2pc":
        ingest_profiled(spark, E.P_STREAM2PC)
    elif which == "binary":
        from pypgoutput_spark.operators import binary_cdc as B

        pdf = B.encode_binary_frames(sf_dir)
        mark(f"encode_binary_frames: {len(pdf)} frames")
        from pypgoutput_spark.wal.generator import FRAMES_SCHEMA

        frames = spark.createDataFrame(pdf, schema=FRAMES_SCHEMA)
        mark("createDataFrame")
        tmp = tempfile.mkdtemp(prefix="prof_bin_")
        table = LakeTable.create(
            spark, f"{tmp}/lake",
            schema=[(c, "string") for c in B.COLUMNS],
            key_cols=["id"], n_buckets=8,
        )
        _pipeline.run_ingest(
            spark, frames, table, relation_id=B.REL_ID,
            n_batches=B.N_SEGMENTS,
            on_batch=lambda m: mark(f"batch done: {m.get('reason') or m.get('mode')}"),
        )
        mark("run_ingest done")
        q = E.queries()["cdc_binary_typed_final_state"]
        # re-running the full query would redo everything; just read back
        table.read().createOrReplaceTempView("cdc_bin_final")
        spark.sql("SELECT * FROM cdc_bin_final").write.format("noop").mode("overwrite").save()
        mark("final read + noop")
    elif which == "docs":
        q = E.queries()["cdc_documents_corpus"]
        df = q(spark, sf_dir)
        mark("query fn returned")
        df.write.format("noop").mode("overwrite").save()
        mark("noop done")
    else:
        q = E.queries()[which]
        df = q(spark, sf_dir)
        mark("query fn returned")
        df.write.format("noop").mode("overwrite").save()
        mark("noop done")
    spark.stop()


if __name__ == "__main__":
    main()
