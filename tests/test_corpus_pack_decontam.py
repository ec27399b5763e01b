"""Sequence packing + benchmark decontamination: exact packing layout on
a handcrafted corpus, Spark ≡ DuckDB parity on both operators."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from pypgoutput_spark.functions.detsql import DUCKDB, SPARK
from pypgoutput_spark.operators.dedup import decontaminate_sql
from pypgoutput_spark.operators.text import (
    pack_sequences_sql,
    q_pack_sequences,
)


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pack"))
    # src A: 3 docs of 100/200/60 tokens -> with seq_len 256 the layout is
    # doc0@(0,0) doc1@(0,100) doc2@(1,44); src B independent
    docs = [
        (0, " ".join(f"w{i}" for i in range(100)), "en", "A"),
        (1, " ".join(f"x{i}" for i in range(200)), "en", "A"),
        (2, " ".join(f"y{i}" for i in range(60)), "en", "A"),
        (3, " ".join(f"z{i}" for i in range(30)), "en", "B"),
        (4, " ".join(f"q{i}" for i in range(300)), "en", "B"),
    ]
    spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in docs],
        schema="doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    ).coalesce(1).write.mode("overwrite").parquet(d + "/documents.parquet")
    return d


def test_pack_sequences_exact_layout(spark, docs_dir):
    got = {r["doc_id"]: r for r in q_pack_sequences(spark, docs_dir).collect()}
    # src A, seq_len 256: running totals 100, 300, 360
    assert (got[0]["seq_id"], got[0]["seq_offset"]) == (0, 0)
    assert (got[1]["seq_id"], got[1]["seq_offset"]) == (0, 100)
    assert (got[2]["seq_id"], got[2]["seq_offset"]) == (1, 300 - 256)
    # src B packs independently of src A
    assert (got[3]["seq_id"], got[3]["seq_offset"]) == (0, 0)
    assert (got[4]["seq_id"], got[4]["seq_offset"]) == (0, 30)
    assert got[4]["cum_tokens"] == 330


@pytest.mark.parametrize("sql_fn", [pack_sequences_sql, decontaminate_sql])
def test_spark_matches_duckdb_at_sf(spark, sql_fn):
    """Parity on the synthetic sf0.001 corpus (rich values: multi-source
    packing; 400+ decontamination hits)."""
    sf = "/root/testdata/sf0.001"
    from pypgoutput_spark.operators.qlib import run_sql

    sdf = run_sql(spark, sf, sql_fn(SPARK), tables=("documents",)).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    odf = con.execute(sql_fn(DUCKDB)).df()
    cols = sorted(sdf.columns)
    sdf = sdf[cols].sort_values(cols).reset_index(drop=True)
    odf = odf[cols].sort_values(cols).reset_index(drop=True)
    assert len(sdf) == len(odf) and len(sdf) > 0
    pd.testing.assert_frame_equal(
        sdf.astype(str), odf.astype(str), check_dtype=False
    )


def test_training_pipeline_composite_gates(spark, tmp_path):
    """corpus_training_pipeline end-to-end on a crafted corpus: the PII
    doc, the repetitive doc, and the low-quality doc are gated out; the
    exact-dup pair keeps the smaller doc_id; survivors get split +
    packing positions."""
    from pypgoutput_spark.operators.text import q_training_pipeline

    # all-distinct words (no duplicate bigrams), stopword present,
    # 100-10000 chars — passes quality + repetition gates
    base = "the " + " ".join(f"word{i}" for i in range(25))
    docs = [
        (0, base + " alpha one", "de", "A"),
        (1, base + " alpha one", "de", "A"),          # exact dup of 0
        (2, base + " beta two contact bob@example.com now", "de", "A"),  # PII
        (3, "spam " * 80, "de", "A"),                  # repetitive (1 bigram)
        (4, "tiny", "de", "A"),                        # fails quality gate
        (5, base + " gamma three", "de", "A"),
    ]
    d = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, t, lang, s, len(t)) for i, t, lang, s in docs],
        schema="doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    ).coalesce(1).write.mode("overwrite").parquet(d + "/documents.parquet")
    got = {r["doc_id"]: r for r in q_training_pipeline(spark, d).collect()}
    assert set(got) == {0, 5}, sorted(got)  # dup 1, PII 2, repetitive 3, tiny 4 gone
    assert got[0]["split"] in ("train", "val", "test")
    # packing is scoped per (source, split): each doc with the smallest
    # doc_id in its (source, split) stream starts at seq 0 / offset 0;
    # a same-split successor continues at the predecessor's token total
    assert got[0]["seq_id"] == 0 and got[0]["seq_offset"] == 0
    if got[5]["split"] == got[0]["split"]:
        assert got[5]["seq_offset"] == got[0]["n_tok"] % 256
    else:
        assert got[5]["seq_id"] == 0 and got[5]["seq_offset"] == 0
