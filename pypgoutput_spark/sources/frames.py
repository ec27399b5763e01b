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


class WalContinuityError(RuntimeError):
    """The frame stream has a hole: a WAL segment is missing from the
    spool (lost object-store file, receiver restart that skipped a
    flush) or two segments' LSN spans overlap (two receivers writing the
    same slot, a mis-numbered upload). Applying across a hole would
    silently drop committed transactions — the one failure class an
    exactly-once pipeline must turn into a loud stop, because the
    watermark would otherwise advance PAST the hole and the lost
    transactions become unrecoverable without an operator-driven rewind.
    """


def check_continuity(frames, after_lsn: int = -1, max_report: int = 20,
                     expect_from_segment: Optional[int] = None) -> dict:
    """Validate the WAL spool before applying a batch.

    Invariants (what a correct receiver produces, reference
    reader.py:334-390 — one process appending segments in LSN order):

      - segment numbers are DENSE: every integer in [lo, hi] is present
        (the receiver numbers segments consecutively as it rolls files);
      - segment LSN spans are ORDERED and DISJOINT:
        max(lsn) of segment s < min(lsn) of segment s+1.

    ``after_lsn`` (pass the table's watermark): segments whose entire
    span is at or below it are already applied and may have been expired
    from the spool — holes there are retention, not loss.

    Scale shape: ONE metadata-only aggregate (payload pruned) down to a
    row per segment, violations computed with lag() over the segment
    order — a single narrow shuffle of #segments rows — and only the
    violations (capped at ``max_report``) ever reach the driver. At
    100 TB with millions of segments nothing O(#segments) is collected.

    The guard checks holes among RETAINED segments: a segment lost at
    the exact retention edge (everything below it expired) is
    indistinguishable from retention without an external anchor. Two
    ways to close that edge: (a) retain at least the segment containing
    the watermark (then the dense chain spans the resume point — pass
    the UNFILTERED frames here, before any ``lsn > watermark`` cut), or
    (b) pass ``expect_from_segment`` (the last applied segment + 1, if
    the caller tracks it) and the first retained segment is checked
    against it.

    Returns {n_segments, first_segment, last_segment} on success;
    raises :class:`WalContinuityError` listing the first violations.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    spans = (
        frames.groupBy("segment")
        .agg(F.min("lsn").alias("lo"), F.max("lsn").alias("hi"))
        # >=, not >: the segment CONTAINING the watermark must anchor
        # the dense chain. With segment-split ingest the watermark IS a
        # segment's max LSN — a strict filter dropped that anchor, so a
        # lost FIRST-pending segment left a dense-looking tail and the
        # guard passed in exactly its headline scenario (lost committed
        # transactions at the resume point).
        .where(F.col("hi") >= F.lit(after_lsn))
        .persist()  # three small actions below read it; scan once
    )
    try:
        return _check_continuity_spans(spans, after_lsn, expect_from_segment,
                                       max_report)
    finally:
        spans.unpersist()


def _check_continuity_spans(spans, after_lsn, expect_from_segment, max_report):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.orderBy("segment")
    checked = spans.select(
        "segment", "lo", "hi",
        F.lag("segment").over(w).alias("prev_seg"),
        F.lag("hi").over(w).alias("prev_hi"),
    ).where(
        # a hole in the dense numbering, or an overlapping/backward span
        (F.col("prev_seg").isNotNull())
        & (
            (F.col("segment") != F.col("prev_seg") + 1)
            | (F.col("lo") <= F.col("prev_hi"))
        )
    )
    bad = checked.limit(max_report).collect()
    if expect_from_segment is not None and not bad:
        first = spans.agg(F.min("segment").alias("s")).collect()[0]["s"]
        # older segments retained is fine (replay is idempotent);
        # first > expected means segments were lost at the edge
        if first is not None and first > expect_from_segment:
            raise WalContinuityError(
                f"first retained segment is {first}, expected "
                f"{expect_from_segment} (last applied + 1): "
                f"{first - expect_from_segment} segment(s) lost at the "
                "retention edge"
            )
    if bad:
        parts = []
        for r in bad:
            if r["segment"] != r["prev_seg"] + 1:
                parts.append(
                    f"segments {r['prev_seg']}..{r['segment']} are not "
                    f"consecutive (missing {r['segment'] - r['prev_seg'] - 1} "
                    f"segment(s); LSN hole ({r['prev_hi']}, {r['lo']}))"
                )
            else:
                parts.append(
                    f"segment {r['segment']} span [{r['lo']}, {r['hi']}] "
                    f"overlaps segment {r['prev_seg']} ending at {r['prev_hi']}"
                )
        raise WalContinuityError(
            "WAL spool continuity violated (after_lsn="
            f"{after_lsn}): " + "; ".join(parts)
        )
    row = spans.agg(
        F.count("*").alias("n_segments"),
        F.min("segment").alias("first_segment"),
        F.max("segment").alias("last_segment"),
    ).collect()[0]
    return dict(row.asDict())


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
