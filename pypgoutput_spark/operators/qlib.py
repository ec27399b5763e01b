"""Helpers for dual-dialect (Spark + DuckDB-oracle) query definitions."""

from __future__ import annotations

import os

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def register_views(spark, sf_dir: str, tables=TABLES, spread=()) -> None:
    """Register parquet tables as temp views.

    ``spread``: tables to repartition to the session's default parallelism
    first — small single-file inputs otherwise serialize compute-heavy
    per-row operators (shingling, hashing, vector math) onto one task. At
    production scale inputs arrive as many files and this is a no-op
    concern; the explicit spread keeps the small-file case honest.
    """
    for t in tables:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            if t in spread:
                df = df.repartition(spark.sparkContext.defaultParallelism)
            df.createOrReplaceTempView(t)


def run_sql(spark, sf_dir: str, sql: str, tables=TABLES, spread=()):
    register_views(spark, sf_dir, tables, spread=spread)
    return spark.sql(sql)
