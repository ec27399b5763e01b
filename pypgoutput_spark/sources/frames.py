"""WAL frame sources.

The engine consumes frames as a DataFrame ``(segment, lsn, mtype?, payload)``
(see wal.generator.FRAMES_SCHEMA). In production those frames come from a
WAL receiver that tails the replication socket (the reference's ExtractRaw
process, reader.py:334-390) and lands them in object storage / a log; in
this sandbox they come from the deterministic synthetic generator.

This module is the thin source layer: schema validation, batch and
streaming readers, and a materializer for generated streams.
"""

from __future__ import annotations

import os
from typing import Optional

from pypgoutput_spark.wal.generator import FRAMES_SCHEMA, GenParams, spark_frames_df

REQUIRED_COLS = ("segment", "lsn", "payload")


def validate_frames(df) -> None:
    missing = [c for c in REQUIRED_COLS if c not in df.columns]
    if missing:
        raise ValueError(
            f"frames DataFrame missing required columns {missing}; "
            f"expected at least (segment BIGINT, lsn BIGINT, payload BINARY)"
        )


def read_frames(spark, path: str):
    """Batch-read a frames directory (parquet)."""
    df = spark.read.schema(FRAMES_SCHEMA).parquet(path)
    validate_frames(df)
    return df


def stream_frames(spark, path: str, max_files_per_trigger: int = 8):
    """Structured-Streaming file source over a frames directory."""
    return (
        spark.readStream.schema(FRAMES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def materialize_synthetic(
    spark, path: str, params: Optional[GenParams] = None, n_partitions: int = 0
) -> str:
    """Generate the deterministic synthetic WAL stream to parquet files.

    One file group per partition → file-granular micro-batching for the
    streaming source.
    """
    params = params or GenParams()
    spark_frames_df(spark, params, n_partitions=n_partitions).write.parquet(path)
    return path


def frames_stats(spark, path: str) -> dict:
    """Cheap metadata summary (payload column pruned)."""
    from pyspark.sql import functions as F

    df = read_frames(spark, path)
    row = df.agg(
        F.count("*").alias("n_frames"),
        F.min("lsn").alias("min_lsn"),
        F.max("lsn").alias("max_lsn"),
        F.countDistinct("segment").alias("n_segments"),
    ).collect()[0]
    return dict(row.asDict())
