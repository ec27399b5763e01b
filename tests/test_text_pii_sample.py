"""PII scrubbing + deterministic stratified sampling (operators/text.py):
handcrafted docs with known matches asserted exactly, and Spark ≡ DuckDB
parity on both operators (the driver's correctness-gate shape)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from pypgoutput_spark.functions.detsql import DUCKDB
from pypgoutput_spark.operators.text import (
    corpus_sample_sql,
    pii_scrub_sql,
    q_corpus_sample,
    q_pii_scrub,
)

DOCS = [
    (1, "mail me at bob@example.com or alice.smith+x@sub.example.org", "en"),
    (2, "server 10.0.0.1 and 192.168.255.254 up; not 1.2.3 (three octets)", "en"),
    (3, "leaked deadbeefdeadbeefdeadbeefdeadbeef and short beef00", "de"),
    (4, "clean text with nothing sensitive at all", "es"),
    (5, "combo: ops@example.net from 127.0.0.1 key 0123456789abcdef0123456789abcdef", "en"),
]


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pii"))
    spark.createDataFrame(
        [(i, t, lang, "unit", len(t)) for i, t, lang in DOCS],
        schema="doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    ).coalesce(1).write.mode("overwrite").parquet(d + "/documents.parquet")
    return d


def _duck(docs_dir, sql):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{docs_dir}/documents.parquet/*.parquet')"
    )
    return con.execute(sql).df().sort_values("doc_id").reset_index(drop=True)


def test_pii_scrub_exact(spark, docs_dir):
    got = {r["doc_id"]: r for r in q_pii_scrub(spark, docs_dir).collect()}
    assert got[1]["n_email"] == 2 and got[1]["n_ipv4"] == 0
    assert "<EMAIL>" in got[1]["text_clean"] and "@" not in got[1]["text_clean"]
    assert got[2]["n_ipv4"] == 2  # the three-octet string must NOT match
    assert got[2]["text_clean"].count("<IP>") == 2 and "1.2.3" in got[2]["text_clean"]
    assert got[3]["n_hex_secret"] == 1  # 6-hex-char word is below the 32 floor
    assert "beef00" in got[3]["text_clean"] and "<SECRET>" in got[3]["text_clean"]
    assert got[4]["n_pii"] == 0 and got[4]["has_pii"] == 0
    assert got[4]["text_clean"] == DOCS[3][1]
    r5 = got[5]
    assert (r5["n_email"], r5["n_ipv4"], r5["n_hex_secret"]) == (1, 1, 1)
    assert r5["text_clean"] == "combo: <EMAIL> from <IP> key <SECRET>"


def test_sample_split_deterministic_and_stratified(spark, docs_dir):
    a = {r["doc_id"]: r for r in q_corpus_sample(spark, docs_dir).collect()}
    b = {r["doc_id"]: r for r in q_corpus_sample(spark, docs_dir).collect()}
    for i in a:
        assert (a[i]["split"], a[i]["sampled"]) == (b[i]["split"], b[i]["sampled"])
        assert a[i]["split"] in ("train", "val", "test")
    # non-'en' docs are never downsampled
    assert a[3]["sampled"] == 1 and a[4]["sampled"] == 1


@pytest.mark.parametrize("sql_fn,q_fn", [
    (pii_scrub_sql, q_pii_scrub),
    (corpus_sample_sql, q_corpus_sample),
])
def test_spark_matches_duckdb(spark, docs_dir, sql_fn, q_fn):
    sdf = q_fn(spark, docs_dir).toPandas().sort_values("doc_id").reset_index(drop=True)
    odf = _duck(docs_dir, sql_fn(DUCKDB))
    assert list(sdf.columns) == list(odf.columns)
    pd.testing.assert_frame_equal(
        sdf.astype(str), odf.astype(str), check_dtype=False
    )
