"""cdc_documents_corpus: a documents-shaped relation through the full
decode → LWW → merge-on-read path (schema-generality pin — every other
CDC entry replays the fixed repo_files relation)."""

from __future__ import annotations

import duckdb
import pandas as pd

from pypgoutput_spark.functions.detsql import DUCKDB
from pypgoutput_spark.operators import corpus_cdc as C

SF = "/root/testdata/sf0.001"


def test_documents_cdc_final_state_matches_oracle(spark):
    got = (
        C.q_documents_corpus(spark, SF).toPandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    want = (
        con.execute(C.documents_corpus_oracle(DUCKDB)).df()
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert len(got) == len(want) and len(got) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)].astype(str),
        want[sorted(got.columns)].astype(str),
        check_dtype=False,
    )
    # the stream actually exercised all three ops
    n_docs = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert len(got) < n_docs, "some documents were deleted"
    assert got["text_sha"].nunique() == len(got)


def test_documents_frames_shape():
    """Frame-layout invariants: one R, one B/C pair per segment,
    transactions never straddle segments, LSNs strictly increasing."""
    pdf = C.encode_documents_frames(SF).sort_values("lsn")
    assert (pdf["mtype"] == "R").sum() == 1
    bs, cs = pdf[pdf.mtype == "B"], pdf[pdf.mtype == "C"]
    assert len(bs) == len(cs) == pdf["segment"].nunique()
    assert pdf["lsn"].is_unique
    for seg, g in pdf[pdf.mtype != "R"].groupby("segment"):
        g = g.sort_values("lsn")
        assert g.iloc[0]["mtype"] == "B" and g.iloc[-1]["mtype"] == "C"


def test_embeddings_cdc_index_matches_oracle(spark):
    """cdc_embeddings_index: the ANN-half twin — a BIGINT-keyed
    quantized-vector relation through the same path, then IVF cell
    assignment over the resolved mirror ≡ the WAL-free oracle."""
    got = (
        C.q_embeddings_index(spark, SF).toPandas()
        .sort_values("vec_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF}/embeddings.parquet')"
    )
    want = (
        con.execute(C.embeddings_index_oracle(DUCKDB)).df()
        .sort_values("vec_id").reset_index(drop=True)
    )
    assert len(got) == len(want) and len(got) > 0
    pd.testing.assert_frame_equal(
        got.astype(str), want[got.columns].astype(str), check_dtype=False,
    )
    n_vecs = con.execute("SELECT count(*) FROM embeddings").fetchone()[0]
    assert len(got) < n_vecs, "some vectors were deleted"
    assert got["c_id"].nunique() > 1, "assignment must use several cells"


def test_embeddings_refresh_reassigns_cells():
    """The point of index-maintenance-from-CDC: a refreshed (negated)
    vector must be able to land in a DIFFERENT cell than its original
    would have — pin that the upserted vectors' assignments are not
    simply the no-CDC assignments."""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF}/embeddings.parquet')"
    )
    with_cdc = {
        r[0]: r[1]
        for r in con.execute(C.embeddings_index_oracle(DUCKDB)).fetchall()
    }
    d = DUCKDB
    quant = d.array_transform(
        "embedding", "x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)"
    )
    no_cdc = {
        r[0]: r[1]
        for r in con.execute(
            f"WITH final AS (SELECT vec_id, {quant} AS qv FROM embeddings),\n"
            + C._emb_assign_sql(d, "final")
        ).fetchall()
    }
    upd = [v for v in with_cdc if C._draw("embu", v) < C.EMB_UPD_PCT]
    assert upd, "the fixture must contain refreshed vectors"
    moved = [v for v in upd if v in no_cdc and with_cdc[v] != no_cdc[v]]
    assert moved, "a negated embedding must re-assign somewhere"
