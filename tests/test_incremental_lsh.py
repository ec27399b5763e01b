"""Incremental LSH dedup (dedup_incremental_lsh): the nightly-append
probe — delta docs signature-probed against the staged base index —
must agree with (a) the full-recompute DuckDB oracle and (b) the
corpus-wide lsh_verified pairs restricted to delta-involving pairs."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from pypgoutput_spark.functions.detsql import DUCKDB
from pypgoutput_spark.operators import dedup as D

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    return con


def test_incremental_matches_oracle(spark):
    got = (
        D.q_incremental_lsh(spark, SF).toPandas()
        .sort_values(["new_doc", "old_doc"]).reset_index(drop=True)
    )
    want = (
        _con().execute(D.incremental_lsh_sql(DUCKDB)).df()
        .sort_values(["new_doc", "old_doc"]).reset_index(drop=True)
    )
    assert len(got) == len(want) and len(got) > 0
    pd.testing.assert_frame_equal(
        got.astype(str), want[got.columns.tolist()].astype(str),
        check_dtype=False,
    )


def test_incremental_consistent_with_full_lsh():
    """Independent invariant: the incremental pairs are exactly the
    corpus-wide LSH-verified pairs that involve >= 1 delta doc, oriented
    new->existing (for delta-delta pairs: larger doc_id is 'new' since
    the smaller arrived first)."""
    con = _con()
    inc = con.execute(D.incremental_lsh_sql(DUCKDB)).df()
    full = con.execute(D.lsh_verified_sql(DUCKDB)).df()
    delta = set(
        con.execute(
            "SELECT doc_id FROM documents WHERE n_chars > 0 AND "
            + D._inc_delta_pred(DUCKDB)
        ).df()["doc_id"]
    )
    # full pairs are doc_a < doc_b; orient each delta-involving pair
    exp = set()
    for a, b in zip(full["doc_a"], full["doc_b"]):
        a_d, b_d = a in delta, b in delta
        if b_d:            # b newer (bigger id): b is tonight's arrival
            exp.add((b, a))
        elif a_d:          # only a in delta: a probes existing b
            exp.add((a, b))
    got = set(zip(inc["new_doc"], inc["old_doc"]))
    assert got == exp
    assert any(o not in delta for _, o in got), "delta-vs-base pairs exist"
    assert len(delta) > 0
