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
