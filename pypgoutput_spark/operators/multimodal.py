"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video in a 100 TB training-data pipeline: the
payload is an opaque BINARY column; decode / feature-extract / resize /
frame-sample run as Arrow-batched pandas kernels over ``mapInPandas``
(one Python process per partition, zero per-row overhead crossing the
JVM boundary). The actual media codecs are not available in this
container, so the decode step is STUBBED (`NotImplementedError`), while
everything Spark-side — schema, batching, partitioning, UDF signature —
is real and tested:

  - `q_payload_meta`: binary payload → (size, sha256, head hex) through a
    real mapInPandas kernel, hash-verified against a DuckDB oracle that
    computes the same bytes arithmetic in SQL.
  - `decode_image` / `decode_audio`: the stub seam where PIL/ffmpeg would
    plug in; raises with a clear message.
  - `fake_image_stats`: deterministic stand-in "feature extraction"
    (per-channel byte sums at stride 4) proving the batch shape end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pypgoutput_spark.functions.detsql import DUCKDB, SPARK, Dialect
from pypgoutput_spark.operators.qlib import register_views

META_SCHEMA = "doc_id BIGINT, payload_size INT, payload_sha256 STRING, head_hex STRING"
STATS_SCHEMA = "doc_id BIGINT, c0 BIGINT, c1 BIGINT, c2 BIGINT, c3 BIGINT"


def decode_image(payload: bytes):
    """Stub: real pipelines plug PIL/turbojpeg here (not in container)."""
    raise NotImplementedError(
        "image decode requires PIL/libjpeg which are not available in this "
        "environment; the Spark-side plumbing (binary column, mapInPandas "
        "batch shape) is exercised via fake_image_stats instead"
    )


def decode_audio(payload: bytes):
    """Stub: real pipelines plug ffmpeg/soundfile here (not in container)."""
    raise NotImplementedError("audio decode not available in this environment")


def _meta_kernel(batches: Iterator) -> Iterator:
    import pandas as pd

    for pdf in batches:
        payloads = [bytes(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "payload_size": [len(p) for p in payloads],
                "payload_sha256": [hashlib.sha256(p).hexdigest() for p in payloads],
                "head_hex": [p[:8].hex() for p in payloads],
            }
        )


def fake_image_stats_kernel(batches: Iterator) -> Iterator:
    """Deterministic stand-in for per-channel feature extraction:
    channel c = sum of payload bytes at positions ≡ c (mod 4). The
    per-byte work is numpy (zero-copy ``np.frombuffer`` views + strided
    sums) — per row only O(1) Python dispatch remains, the shape a real
    codec wrapper would have."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        n = len(pdf)
        sums = np.zeros((n, 4), dtype=np.int64)
        for r, p in enumerate(pdf["payload"]):
            a = np.frombuffer(p, dtype=np.uint8)
            for c in range(4):
                sums[r, c] = a[c::4].sum(dtype=np.int64)
        rows = {"doc_id": pdf["doc_id"].values}
        for c in range(4):
            rows[f"c{c}"] = sums[:, c]
        yield pd.DataFrame(rows)


def q_payload_meta(spark, sf_dir: str):
    register_views(spark, sf_dir, tables=("documents",))
    payloads = spark.sql(
        "SELECT doc_id, encode(text, 'UTF-8') AS payload FROM documents WHERE n_chars > 0"
    )
    return payloads.mapInPandas(_meta_kernel, schema=META_SCHEMA)


def payload_meta_oracle_sql() -> str:
    # identical bytes arithmetic in SQL (texts are UTF-8; head is the
    # first 8 *bytes* — equal to 8 chars for this ASCII corpus)
    return """
SELECT doc_id,
  strlen(text) AS payload_size,
  sha256(text) AS payload_sha256,
  lower(hex(encode(substr(text, 1, 8)))) AS head_hex
FROM documents
WHERE n_chars > 0
""".strip()


def q_fake_image_stats(spark, sf_dir: str):
    register_views(spark, sf_dir, tables=("documents",))
    payloads = spark.sql(
        "SELECT doc_id, encode(text, 'UTF-8') AS payload FROM documents WHERE n_chars > 0"
    )
    return payloads.mapInPandas(fake_image_stats_kernel, schema=STATS_SCHEMA)


def fake_image_stats_oracle_sql() -> str:
    d = DUCKDB
    parts = []
    for c in range(4):
        chars = d.array_transform(
            d.sequence(str(c + 1), "length(text)"),
            "i -> CASE WHEN (i - 1) % 4 = " + str(c) + " THEN ascii(substr(text, i, 1)) ELSE 0 END",
        )
        parts.append(
            f"CAST({d.fold(chars, 'CAST(0 AS BIGINT)', '(acc, x) -> acc + x')} AS BIGINT) AS c{c}"
        )
    cols = ",\n  ".join(parts)
    return f"""
SELECT doc_id,
  {cols}
FROM documents
WHERE n_chars > 0
""".strip()


FRAME_SCHEMA = "doc_id BIGINT, frame_idx INT, frame_sum BIGINT, first_byte INT"
#: "video" layout stand-in: 16-byte frames, sample every 4th, cap 8 samples
FRAME_BYTES, FRAME_STRIDE, MAX_SAMPLES = 16, 4, 8


def frame_sample_kernel(batches: Iterator) -> Iterator:
    """Frame-sampling batch shape (video decode stand-in): the payload is
    treated as a stream of FRAME_BYTES-sized frames; every FRAME_STRIDE-th
    frame is sampled (capped at MAX_SAMPLES) and summarized. A real
    pipeline puts ffmpeg keyframe extraction here; the Spark-side
    plumbing — binary in, exploded one-row-per-sampled-frame out, Arrow
    batches both ways — is exactly this."""
    import numpy as np
    import pandas as pd

    step = FRAME_STRIDE * FRAME_BYTES
    for pdf in batches:
        out = {"doc_id": [], "frame_idx": [], "frame_sum": [], "first_byte": []}
        for doc_id, p in zip(pdf["doc_id"].values, pdf["payload"]):
            a = np.frombuffer(p, dtype=np.uint8)
            if a.size < FRAME_BYTES:
                continue
            k = min(MAX_SAMPLES, (a.size - FRAME_BYTES) // step + 1)
            offs = np.arange(k) * step
            frames = a[offs[:, None] + np.arange(FRAME_BYTES)]
            out["doc_id"].append(np.full(k, doc_id, dtype=np.int64))
            out["frame_idx"].append((np.arange(k) * FRAME_STRIDE).astype(np.int32))
            out["frame_sum"].append(frames.sum(axis=1, dtype=np.int64))
            out["first_byte"].append(frames[:, 0].astype(np.int32))
        if out["doc_id"]:
            yield pd.DataFrame({
                k_: np.concatenate(v) for k_, v in out.items()
            })


def q_frame_sample(spark, sf_dir: str):
    register_views(spark, sf_dir, tables=("documents",), spread=("documents",))
    payloads = spark.sql(
        "SELECT doc_id, encode(text, 'UTF-8') AS payload FROM documents WHERE n_chars > 0"
    )
    return payloads.mapInPandas(frame_sample_kernel, schema=FRAME_SCHEMA)


def frame_sample_oracle_sql() -> str:
    d = DUCKDB
    fb = FRAME_BYTES
    chars = d.array_transform(
        d.sequence("g * 4 * " + str(fb) + " + 1", f"g * 4 * {fb} + {fb}"),
        "i -> ascii(substr(text, i, 1))",
    )
    frame_sum = d.fold(chars, "CAST(0 AS BIGINT)", "(acc, x) -> acc + x")
    return f"""
SELECT doc_id,
  CAST(g * {FRAME_STRIDE} AS INT) AS frame_idx,
  {frame_sum} AS frame_sum,
  ascii(substr(text, g * {FRAME_STRIDE} * {fb} + 1, 1)) AS first_byte
FROM documents, (SELECT unnest(range(0, {MAX_SAMPLES})) AS g) s
WHERE n_chars > 0 AND g * {FRAME_STRIDE} * {fb} + {fb} <= strlen(text)
""".strip()


QUERIES = {
    "mm_payload_meta": (q_payload_meta, payload_meta_oracle_sql()),
    "mm_fake_image_stats": (q_fake_image_stats, fake_image_stats_oracle_sql()),
    "mm_frame_sample": (q_frame_sample, frame_sample_oracle_sql()),
}
