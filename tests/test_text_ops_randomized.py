"""Randomized cross-engine parity for the per-row corpus operators.

One deterministic pseudo-random corpus (seeded; multi-line, repeated
phrases, PII-like tokens, unicode, edge whitespace) is pushed through
EVERY dual-dialect per-row text operator on both engines — the same
compare the driver's correctness gate runs, but over adversarial inputs
the synthetic testdata never produces."""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from pypgoutput_spark.functions.detsql import DUCKDB, SPARK
from pypgoutput_spark.operators import text as text_ops
from pypgoutput_spark.operators.qlib import run_sql

WORDS = (
    "the quick brown fox jumps over lazy dog alpha beta gamma "
    "deadbeefdeadbeefdeadbeefdeadbeef bob@example.com 10.0.0.1 "
    "der und ist el que le et ärger çöz 漢字 emoji🙂 x" ).split()


def _doc(rng: random.Random) -> str:
    lines = []
    for _ in range(rng.randint(1, 6)):
        n = rng.randint(0, 12)
        words = [rng.choice(WORDS) for _ in range(n)]
        if words and rng.random() < 0.4:      # forced phrase repetition
            words += words[: rng.randint(1, len(words))]
        lines.append(" ".join(words))
    if rng.random() < 0.3:                    # duplicate whole lines
        lines += [rng.choice(lines)] * rng.randint(1, 2)
    sep = "\n" if rng.random() < 0.8 else "\n\n"
    return sep.join(lines)


@pytest.fixture(scope="module")
def rand_docs_dir(spark, tmp_path_factory):
    rng = random.Random(20260817)
    docs = []
    for i in range(120):
        t = _doc(rng)
        docs.append((i, t, rng.choice(["en", "de", "es", "fr"]),
                     f"src{i % 5}", len(t)))
    d = str(tmp_path_factory.mktemp("randdocs"))
    spark.createDataFrame(
        docs,
        schema="doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    ).coalesce(1).write.mode("overwrite").parquet(d + "/documents.parquet")
    return d


SQL_FNS = [
    text_ops.token_count_sql,
    text_ops.quality_score_sql,
    text_ops.lang_id_sql,
    text_ops.fingerprint_sql,
    text_ops.repetition_sql,
    text_ops.pii_scrub_sql,
    text_ops.corpus_sample_sql,
    text_ops.pack_sequences_sql,
    text_ops.corpus_training_ready_sql,
    text_ops.training_pipeline_sql,
    text_ops.corpus_stats_sql,
    text_ops.chunk_sql,
    text_ops.corpus_split_sql,
]


@pytest.mark.parametrize("sql_fn", SQL_FNS, ids=lambda f: f.__name__)
def test_randomized_corpus_parity(spark, rand_docs_dir, sql_fn):
    sdf = run_sql(
        spark, rand_docs_dir, sql_fn(SPARK), tables=("documents",)
    ).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{rand_docs_dir}/documents.parquet/*.parquet')"
    )
    odf = con.execute(sql_fn(DUCKDB)).df()
    cols = sorted(sdf.columns)
    sdf = sdf[cols].sort_values(cols).reset_index(drop=True)
    odf = odf[cols].sort_values(cols).reset_index(drop=True)
    assert len(sdf) == len(odf) and len(sdf) > 0
    pd.testing.assert_frame_equal(
        sdf.astype(str), odf.astype(str), check_dtype=False
    )
