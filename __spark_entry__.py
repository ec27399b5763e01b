"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: the full CDC pipeline (deterministic binary
pgoutput WAL stream → vectorized decode → LWW → bucketed lake merge) at
small scale, returning the final merged table state.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
(SURVEY.md §2 + the training-data operator suite). Every SQL-expressible
operator has a DuckDB oracle built from the *same* deterministic
expressions (see pypgoutput_spark/functions/detsql.py); the two CDC
binary-pipeline entries carry standalone oracles that regenerate the
logical change stream in pure SQL and replay it with serial reference
semantics — the oracle never touches the binary path, so a match proves
encode → decode → merge end-to-end.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pypgoutput_spark.lake.table import LakeTable
from pypgoutput_spark.operators import (
    analytics as _analytics,
    decode as _decode,
    dedup as _dedup,
    multimodal as _multimodal,
    similarity as _similarity,
    text as _text,
)
from pypgoutput_spark.streaming import pipeline as _pipeline
from pypgoutput_spark.wal import generator as _gen

#: fixed parameters for the CDC correctness entries (self-synthesized
#: deterministic input — independent of sf_dir per the input hint)
P_ENTRY = _gen.GenParams(
    n_txns=150, ops_per_txn=8, n_repos=50, n_paths=30,
    toast_pct=30, truncate_every=40, txns_per_segment=15,
)


def _run_cdc_pipeline(spark: SparkSession, p: _gen.GenParams) -> DataFrame:
    tmp = tempfile.mkdtemp(prefix="pypgoutput_spark_lake_")
    table = LakeTable.create(
        spark, f"{tmp}/lake",
        schema=[(c, "string") for c in _gen.ALL_COLUMNS],
        key_cols=list(_gen.KEY_COLUMNS), n_buckets=8,
    )
    frames = _gen.spark_frames_df(spark, p)
    _pipeline.run_ingest(spark, frames, table, n_batches=3)
    return table.read().selectExpr(
        "repo", "path", "`commit`", "lang", "content",
        "sha2(content, 256) AS content_sha",
    )


def q_cdc_pipeline_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_cdc_pipeline(spark, P_ENTRY)


def q_cdc_decoded_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-only slice: binary frames → typed I/U change events."""
    frames = _gen.spark_frames_df(spark, P_ENTRY)
    events = _decode.decode_frames(frames)
    return events.filter("op IN ('I','U')").selectExpr(
        "lsn", "op",
        "after['repo'] AS repo", "after['path'] AS path",
        "after['commit'] AS commit", "after['lang'] AS lang",
        "after['content'] AS content",
        "array_contains(coalesce(after_unchanged, array()), 'content') AS content_unchanged",
        "xid", "begin_lsn",
    )


def _cdc_decoded_events_oracle(p: _gen.GenParams) -> str:
    stride = p.lsn_stride
    return f"""
WITH ev AS ({_gen.duckdb_events_sql(p)})
SELECT lsn, op, repo, path, "commit", lang,
  CASE WHEN content_unchanged THEN NULL ELSE content END AS content,
  content_unchanged,
  1000 + txn AS xid,
  10 + txn * {stride} AS begin_lsn
FROM ev WHERE op IN ('I','U')
""".strip()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full CDC pipeline at small scale (driver checks rows>0)."""
    p = _gen.GenParams(n_txns=40, ops_per_txn=6, txns_per_segment=10)
    return _run_cdc_pipeline(spark, p)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "cdc_pipeline_final_state": q_cdc_pipeline_final_state,
        "cdc_decoded_events": q_cdc_decoded_events,
    }
    for mod in (_text, _dedup, _similarity, _multimodal, _analytics):
        for name, (fn, _sql) in mod.QUERIES.items():
            out[name] = fn
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {
        "cdc_pipeline_final_state": _gen.duckdb_final_state_sql(P_ENTRY, with_sha=True),
        "cdc_decoded_events": _cdc_decoded_events_oracle(P_ENTRY),
    }
    for mod in (_text, _dedup, _similarity, _multimodal, _analytics):
        for name, (_fn, sql) in mod.QUERIES.items():
            if sql is not None:
                out[name] = sql
    return out
