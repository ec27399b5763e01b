"""Gopher-style repetition filters (operators/text.py repetition_sql):
handcrafted documents with known duplicate-line / duplicate-n-gram
structure, asserted exactly AND cross-checked Spark ≡ DuckDB (the same
dual-dialect SQL the driver's correctness gate runs)."""

from __future__ import annotations

import duckdb
import pytest

from pypgoutput_spark.functions.detsql import DUCKDB
from pypgoutput_spark.operators.text import q_repetition, repetition_sql

DOCS = [
    # doc 0: 4 lines, 2 identical -> dup_line_frac 0.25 (1 dup of 4);
    # "spam spam spam spam" -> 3 bigrams all equal -> dup_2gram 2/3
    (0, "spam spam spam spam\nalpha beta gamma\nunique line here\nalpha beta gamma"),
    # doc 1: no repetition at all
    (1, "one two three four five\nsix seven eight nine ten"),
    # doc 2: single line, single token — every denominator degenerate
    (2, "solo"),
    # doc 3: heavy line repetition -> trips the 0.30 line gate
    (3, "nav bar item\nnav bar item\nnav bar item\nnav bar item\ncontent"),
]


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("textrep"))
    spark.createDataFrame(
        [(i, t, "en", "unit", len(t)) for i, t in DOCS],
        schema="doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    ).coalesce(1).write.mode("overwrite").parquet(d + "/documents.parquet")
    return d


def test_repetition_exact_values(spark, docs_dir):
    got = {r["doc_id"]: r for r in q_repetition(spark, docs_dir).collect()}
    assert set(got) == {0, 1, 2, 3}

    r0 = got[0]
    assert r0["n_lines"] == 4
    assert r0["dup_line_frac"] == pytest.approx(0.25)
    # duplicate line "alpha beta gamma" (16 chars) counted once in the
    # distinct char sum: (19+16+16+16 - (19+16+16)) / 67
    assert r0["dup_line_char_frac"] == pytest.approx(16 / 67)
    # tokens: spam*4 alpha beta gamma unique line here alpha beta gamma
    # = 13 tokens -> 12 bigrams; dups: "spam spam" x3 (2 extra),
    # "alpha beta" x2, "beta gamma" x2 (1 extra each) -> 4/12
    assert r0["n_toks"] == 13
    assert r0["dup_2gram_frac"] == pytest.approx(4 / 12)

    r1 = got[1]
    assert r1["dup_line_frac"] == 0.0
    assert r1["dup_2gram_frac"] == 0.0
    assert r1["dup_3gram_frac"] == 0.0
    assert r1["repetitive"] == 0

    r2 = got[2]  # 1 line, 1 token: zero bigrams/trigrams, no NaNs
    assert r2["n_toks"] == 1
    assert r2["dup_line_frac"] == 0.0
    assert r2["dup_2gram_frac"] == 0.0
    assert r2["dup_3gram_frac"] == 0.0
    assert r2["repetitive"] == 0

    r3 = got[3]  # 4 copies of 5 lines -> 3/5 dup lines > 0.30 gate
    assert r3["dup_line_frac"] == pytest.approx(3 / 5)
    assert r3["repetitive"] == 1


def test_repetition_spark_matches_duckdb(spark, docs_dir):
    sdf = (
        q_repetition(spark, docs_dir)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{docs_dir}/documents.parquet/*.parquet')"
    )
    odf = con.execute(repetition_sql(DUCKDB)).df() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(sdf.columns) == list(odf.columns)
    for c in sdf.columns:
        assert sdf[c].astype(float).tolist() == pytest.approx(
            odf[c].astype(float).tolist()
        ), c
