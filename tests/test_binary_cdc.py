"""cdc_binary_typed_final_state: a TYPED relation replicated with every
value cell in binary send format (PG14+ ``binary = on``) through the
full decode → LWW → merge-on-read path, resolved against an oracle that
computes the typed values natively (never a WAL byte or a text spelling
of the binary columns)."""

from __future__ import annotations

import duckdb
import pandas as pd

from pypgoutput_spark.functions.detsql import DUCKDB
from pypgoutput_spark.operators import binary_cdc as B

SF = "/root/testdata/sf0.001"


def test_binary_typed_final_state_matches_oracle(spark):
    got = (
        B.q_binary_typed_final_state(spark, SF).toPandas()
        .sort_values("id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF}/orders.parquet')"
    )
    want = (
        con.execute(B.binary_typed_oracle(DUCKDB)).df()
        .sort_values("id").reset_index(drop=True)
    )
    assert len(got) == len(want) and len(got) > 0
    cols = sorted(got.columns)
    for c in cols:
        a, b = got[c], want[c]
        if a.dtype != object and b.dtype != object:
            same = (a.values == b.values) | (pd.isna(a.values) & pd.isna(b.values))
        else:
            same = a.astype(str).values == b.astype(str).values
        assert same.all(), (c, a[~same].head(3), b[~same].head(3))
    # floats carried BITS: doubled prices from updates match exactly
    upd = got[got.status.str.endswith("+")]
    assert len(upd) > 0, "some orders were revised"
    n = con.execute("SELECT count(*) FROM orders").fetchone()[0]
    assert len(got) < n, "some orders were deleted"
    # TOAST-'u' jsonb inside binary tuples: revised rows keep the
    # insert's jsonb value (never NULL)
    assert upd.pr.notna().all() and upd.pr.str.startswith('{"p": "').all()


def test_binary_frames_are_binary():
    """Every value cell of every I/U frame rides as category 'b' (or
    'n'/'u'), never text — the fixture must exercise the binary path."""
    from pypgoutput_spark.wal import codec

    pdf = B.encode_binary_frames(SF)
    seen_b = seen_u = 0
    for _, row in pdf[pdf.mtype.isin(["I", "U"])].head(500).iterrows():
        d = codec.decode_message(bytes(row.payload))
        for cat, _v in d["new"]:
            assert cat in ("b", "n", "u"), cat
            seen_b += cat == "b"
            seen_u += cat == "u"
    assert seen_b > 1000
    assert seen_u > 0  # the update's TOAST-'u' jsonb cells
