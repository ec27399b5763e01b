#!/usr/bin/env python
"""Benchmark harness.

Default mode (what the driver runs):
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench.py
prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline metric is the CDC north-star: change-events/sec applied
end-to-end (binary WAL frame generation excluded; decode → LWW → merge
included), over a synthetic stream sized ~proportional to sf. Per-query
wall times for the operator suite run against the sf parquet tables.

Scaling mode (evidence for the N→4N criterion; writes BENCH/BASELINE.md):
    python bench.py --scaling
runs the identical CDC job on byte-identical input at local[8] and
local[32] in separate processes and reports throughput at both plus
efficiency = (T_32 / T_8) / 4.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time


def _mk_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("pypgoutput_spark-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
        .getOrCreate()
    )


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def cdc_params(sf: float):
    from pypgoutput_spark.wal.generator import GenParams

    n_txns = max(200, int(25_000 * sf / 0.1))
    return GenParams(
        n_txns=n_txns, ops_per_txn=8, n_repos=max(50, n_txns // 25),
        n_paths=40, toast_pct=25, truncate_every=0,
        txns_per_segment=max(10, n_txns // 256),
    )


def bench_cdc(spark, sf: float, salt_buckets: int = 0) -> dict:
    from pypgoutput_spark.lake.table import LakeTable
    from pypgoutput_spark.streaming import pipeline
    from pypgoutput_spark.wal import generator as gen

    p = cdc_params(sf)
    tmp = tempfile.mkdtemp(prefix="bench_lake_")
    try:
        frames_dir = os.path.join(tmp, "frames")
        # materialize frames first: the timed section measures the engine
        # (scan → decode → LWW → merge), not the synthetic generator
        gen.spark_frames_df(spark, p).write.parquet(frames_dir)
        frames = spark.read.parquet(frames_dir)
        # warm-up: one tiny ingest into a throwaway table pays the one-time
        # Python-worker fork / Arrow init / codegen compile costs so the
        # timed section measures steady-state throughput
        warm_table = LakeTable.create(
            spark, os.path.join(tmp, "warm"),
            schema=[(c, "string") for c in gen.ALL_COLUMNS],
            key_cols=list(gen.KEY_COLUMNS), n_buckets=8,
        )
        warm_frames = gen.spark_frames_df(spark, gen.GenParams(n_txns=40, ops_per_txn=5))
        pipeline.run_ingest(spark, warm_frames, warm_table)
        table = LakeTable.create(
            spark, os.path.join(tmp, "lake"),
            schema=[(c, "string") for c in gen.ALL_COLUMNS],
            key_cols=list(gen.KEY_COLUMNS),
            n_buckets=32,
        )
        t0 = time.monotonic()
        pipeline.run_ingest(spark, frames, table, n_batches=1, salt_buckets=salt_buckets)
        wall = time.monotonic() - t0
        return {
            "wall_sec": wall,
            "n_change_events": p.n_ops,
            "events_per_sec": p.n_ops / wall,
            "final_rows": table.read().count(),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


BENCH_QUERIES = (
    "cdc_pipeline_final_state",
    "text_fingerprint",
    "text_quality_score",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "sim_topk_bruteforce",
    "sim_lsh_ann_pairs",
    "mm_payload_meta",
    "cdc_events_latest_by_user",
    "events_sessionize",
    "agg_pricing_summary",
    "join_nation_revenue",
    "join_order_rollup",
)


def bench_queries(spark, sf_dir: str) -> dict:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    out = {}
    for name in BENCH_QUERIES:
        fn = qs[name]
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # force full compute
        out[name] = round(time.monotonic() - t0, 3)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_of(sf_dir)

    if "--scaling" in sys.argv:
        run_scaling(sf_dir)
        return

    spark = _mk_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    cdc = bench_cdc(spark, sf)
    queries = {"cdc_e2e_ingest": round(cdc["wall_sec"], 3)}
    if "--cdc-only" not in sys.argv:
        queries.update(bench_queries(spark, sf_dir))
    total = sum(queries.values())
    result = {
        "metric": "cdc_change_events_per_sec_e2e",
        "value": round(cdc["events_per_sec"], 1),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "cpus": cpus,
        "cdc_events": cdc["n_change_events"],
        "total_wall_sec": round(total, 3),
    }
    spark.stop()
    print(json.dumps(result))


def run_scaling(sf_dir: str) -> None:
    """Same job, byte-identical input, local[8] vs local[32]."""
    results = {}
    for cpus in (8, 32):
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=str(cpus))
        out = subprocess.run(
            [sys.executable, __file__, "--cdc-only"],
            env=env, capture_output=True, text=True, check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    t8, t32 = results[8]["value"], results[32]["value"]
    eff = (t32 / t8) / 4.0
    summary = {
        "events_per_sec_local8": t8,
        "events_per_sec_local32": t32,
        "scaling_efficiency_8_to_32": round(eff, 3),
        "sf": results[32]["sf"],
        "cdc_events": results[32]["cdc_events"],
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
