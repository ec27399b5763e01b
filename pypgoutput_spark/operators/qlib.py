"""Helpers for dual-dialect (Spark + DuckDB-oracle) query definitions."""

from __future__ import annotations

import os

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def register_views(spark, sf_dir: str, tables=TABLES) -> None:
    for t in tables:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            spark.read.parquet(path).createOrReplaceTempView(t)


def run_sql(spark, sf_dir: str, sql: str, tables=TABLES):
    register_views(spark, sf_dir, tables)
    return spark.sql(sql)
