"""Generator invariants: dialect parity, encoder byte-compatibility,
parallelism-independence (the scaling runs must consume identical input)."""

from __future__ import annotations

import duckdb
import pandas as pd

from pypgoutput_spark.wal import codec
from pypgoutput_spark.wal import generator as gen


def test_spark_duckdb_event_parity(spark):
    p = gen.GenParams(n_txns=30, ops_per_txn=5, truncate_every=9)
    dd = duckdb.sql(gen.duckdb_events_sql(p)).df().sort_values("i").reset_index(drop=True)
    sp = gen.spark_events_df(spark, p).toPandas().sort_values("i").reset_index(drop=True)
    pd.testing.assert_frame_equal(sp[dd.columns.tolist()], dd, check_dtype=False)


def test_fast_encoder_matches_reference_grammar(spark):
    """The specialized kernel's bytes decode to exactly the logical stream
    (and are grammar-identical to the general codec encoder)."""
    p = gen.GenParams(n_txns=12, ops_per_txn=6, toast_pct=50, truncate_every=5)
    frames = gen.spark_frames_df(spark, p).collect()
    logical = {
        int(r["lsn"]): r
        for r in gen.spark_events_df(spark, p).collect()
    }
    n_checked = 0
    for row in frames:
        payload = bytes(row["payload"])
        m = codec.decode_message(payload)  # grammar-valid by construction
        assert row["mtype"] == m["msg_type"]
        if m["msg_type"] in ("I", "U"):
            ev = logical[int(row["lsn"])]
            # re-encode via the general encoder: byte-identical
            cells = [
                ("t", ev["repo"]), ("t", ev["path"]), ("t", ev["commit"]),
                ("t", ev["lang"]) if ev["lang"] is not None else ("n", None),
                ("u", None) if (m["msg_type"] == "U" and ev["content_unchanged"])
                else ("t", ev["content"]),
            ]
            if m["msg_type"] == "I":
                ref = codec.encode_insert(gen.RELATION_ID, cells)
            else:
                ref = codec.encode_update(gen.RELATION_ID, cells)
            assert payload == ref
            n_checked += 1
        elif m["msg_type"] == "D":
            ev = logical[int(row["lsn"])]
            ref = codec.encode_delete(
                gen.RELATION_ID,
                [("t", ev["repo"]), ("t", ev["path"]), ("n", None), ("n", None), ("n", None)],
                kind="K",
            )
            assert payload == ref
            n_checked += 1
    assert n_checked > 20


def test_frames_independent_of_parallelism(spark):
    """local[8]-vs-local[32] evidence precondition: identical bytes
    regardless of partition count."""
    p = gen.GenParams(n_txns=20, ops_per_txn=4)
    a = sorted(
        (int(r["lsn"]), bytes(r["payload"]))
        for r in gen.spark_frames_df(spark, p, n_partitions=2).collect()
    )
    b = sorted(
        (int(r["lsn"]), bytes(r["payload"]))
        for r in gen.spark_frames_df(spark, p, n_partitions=16).collect()
    )
    assert a == b
