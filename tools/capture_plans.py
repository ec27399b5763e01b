#!/usr/bin/env python
"""Capture .explain("formatted") for every bench query into a directory.

    python tools/capture_plans.py <out_dir> <suffix> [tree_root] [names...]

``tree_root``: optional path to an alternate repo tree (e.g. an export of
the round-start commit) — prepended to sys.path so __spark_entry__ and
pypgoutput_spark resolve there; used to produce the _before plans.
"""
from __future__ import annotations

import contextlib
import io
import os
import sys

out_dir, suffix = sys.argv[1], sys.argv[2]
tree = sys.argv[3] if len(sys.argv) > 3 and sys.argv[3] != "-" else None
names = sys.argv[4:]
if tree:
    sys.path.insert(0, tree)
else:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
spark = (
    SparkSession.builder.master("local[16]")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entry  # noqa: E402

qs = entry.queries()
os.makedirs(out_dir, exist_ok=True)
for name in (names or sorted(qs)):
    try:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"{name}: ok", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: ERROR {type(e).__name__}: {e}", flush=True)
spark.stop()
