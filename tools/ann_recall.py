#!/usr/bin/env python
"""Measure recall@k of the sim_lsh_topk ANN shape vs brute-force cosine.

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/ann_recall.py

Prints one JSON line per (bits_per_band, n_bands, multiprobe) setting;
results are recorded in BENCH/BASELINE.md. Runs entirely in Spark with
the operator's own quantization, hyperplanes, and tie-break.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SETTINGS = [
    (4, 4, 0),   # r2 defaults (recorded for comparison)
    (4, 8, 0),
    (4, 12, 0),
    (4, 4, 2),
    (4, 8, 2),   # current operator defaults
    (4, 8, 3),
]


def main() -> None:
    from pyspark.sql import SparkSession

    from pypgoutput_spark.operators.similarity import ann_recall_at_k

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    n = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).count()
    for bpb, nb, mp in SETTINGS:
        r = ann_recall_at_k(
            spark, sf_dir, k=10, bits_per_band=bpb, n_bands=nb,
            n_queries=int(os.environ.get("ANN_QUERIES", "20")), multiprobe=mp,
        )
        r["corpus"] = n
        r["candidate_fraction"] = round(r["mean_candidates"] / n, 4)
        print(json.dumps(r))
    spark.stop()


if __name__ == "__main__":
    main()
