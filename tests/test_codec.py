"""Conformance + round-trip tests for the pgoutput wire codec.

The golden wire payloads are the reference's hand-captured frames
(dgea005/pypgoutput tests/test_decoders.py:8-126) — used here as a
conformance corpus: our decoder must reproduce every asserted field.
Round-trip tests then pin the encoder as the exact grammar inverse.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pypgoutput_spark.wal import codec

# --- golden payloads (conformance corpus from reference tests/test_decoders.py) ---

GOLDEN_RELATION = (
    b"R\x00\x00@\x01public\x00test_table\x00d\x00\x02\x01id\x00\x00\x00\x00\x17"
    b"\xff\xff\xff\xff\x00created\x00\x00\x00\x04\xa0\xff\xff\xff\xff"
)
GOLDEN_BEGIN = b"B\x00\x00\x00\x00\x01f4\x98\x00\x02ck\xd8i\x8a1\x00\x00\x01\xeb"
GOLDEN_INSERT = b"I\x00\x00@\x01N\x00\x02t\x00\x00\x00\x015t\x00\x00\x00\x162012-01-01 12:00:00+00"
GOLDEN_UPDATE = b"U\x00\x00@\x01N\x00\x02t\x00\x00\x00\x015t\x00\x00\x00\x162013-01-01 12:00:00+00"
GOLDEN_DELETE = b"D\x00\x00@\x01K\x00\x02t\x00\x00\x00\x014n"
GOLDEN_COMMIT = b"C\x00\x00\x00\x00\x00\x01f4\x98\x00\x00\x00\x00\x01f4\xc8\x00\x02cl\x83\x8f\xd2\xa1"
GOLDEN_TRUNCATE = b"T\x00\x00\x00\x01\x00\x00\x00@\x01"


def test_golden_relation():
    m = codec.decode_message(GOLDEN_RELATION)
    assert m["msg_type"] == "R"
    assert m["relation_id"] == 16385
    assert m["namespace"] == "public"
    assert m["relation_name"] == "test_table"
    assert m["replica_identity"] == "d"
    assert m["columns"] == [
        {"part_of_pkey": 1, "name": "id", "type_id": 23, "atttypmod": -1},
        {"part_of_pkey": 0, "name": "created", "type_id": 1184, "atttypmod": -1},
    ]


def test_golden_begin():
    m = codec.decode_message(GOLDEN_BEGIN)
    assert m["msg_type"] == "B"
    assert m["lsn"] == 23475352
    assert m["xid"] == 491
    assert codec.pg_ts_to_datetime(m["commit_ts_us"]).isoformat() == "2021-04-20T20:13:16.867121+00:00"


def test_golden_insert():
    m = codec.decode_message(GOLDEN_INSERT)
    assert m["msg_type"] == "I"
    assert m["relation_id"] == 16385
    assert m["new"] == [("t", "5"), ("t", "2012-01-01 12:00:00+00")]


def test_golden_update_no_old_tuple():
    m = codec.decode_message(GOLDEN_UPDATE)
    assert m["msg_type"] == "U"
    assert m["relation_id"] == 16385
    assert m["old_kind"] is None and m["old"] is None
    assert m["new"] == [("t", "5"), ("t", "2013-01-01 12:00:00+00")]


def test_golden_delete():
    m = codec.decode_message(GOLDEN_DELETE)
    assert m["msg_type"] == "D"
    assert m["relation_id"] == 16385
    assert m["old_kind"] == "K"
    # key image: id=4, second column NULL
    assert m["old"] == [("t", "4"), ("n", None)]


def test_golden_commit():
    m = codec.decode_message(GOLDEN_COMMIT)
    assert m["msg_type"] == "C"
    assert m["flags"] == 0
    assert m["lsn_commit"] == 23475352
    assert m["lsn_end"] == 23475400
    assert codec.pg_ts_to_datetime(m["commit_ts_us"]).isoformat() == "2021-04-20T21:01:08.279969+00:00"


def test_golden_truncate():
    m = codec.decode_message(GOLDEN_TRUNCATE)
    assert m["msg_type"] == "T"
    assert m["option_bits"] == 0
    assert m["relation_ids"] == [16385]


def test_bad_category_byte_raises():
    # valid insert header followed by a bogus tuple category byte
    bad = b"I\x00\x00@\x01N\x00\x01x"
    with pytest.raises(ValueError):
        codec.decode_message(bad)


def test_update_missing_new_marker_raises():
    bad = b"U\x00\x00@\x01Q\x00\x00"
    with pytest.raises(ValueError):
        codec.decode_message(bad)


def test_delete_bad_kind_raises():
    bad = b"D\x00\x00@\x01N\x00\x00"
    with pytest.raises(ValueError):
        codec.decode_message(bad)


def test_unknown_type_byte_raises():
    with pytest.raises(ValueError):
        codec.decode_message(b"Z\x00")


# --- encoder/decoder round-trips ------------------------------------------------


def test_encode_matches_golden_frames():
    """Encoder is the exact grammar inverse — byte-identical to the
    reference's captured frames for the same logical content."""
    assert (
        codec.encode_relation(
            16385, "public", "test_table", "d",
            [(1, "id", 23, -1), (0, "created", 1184, -1)],
        )
        == GOLDEN_RELATION
    )
    b = codec.decode_message(GOLDEN_BEGIN)
    assert codec.encode_begin(b["lsn"], b["commit_ts_us"], b["xid"]) == GOLDEN_BEGIN
    assert codec.encode_insert(16385, [("t", "5"), ("t", "2012-01-01 12:00:00+00")]) == GOLDEN_INSERT
    assert codec.encode_update(16385, [("t", "5"), ("t", "2013-01-01 12:00:00+00")]) == GOLDEN_UPDATE
    assert codec.encode_delete(16385, [("t", "4"), ("n", None)], kind="K") == GOLDEN_DELETE
    c = codec.decode_message(GOLDEN_COMMIT)
    assert codec.encode_commit(c["lsn_commit"], c["lsn_end"], c["commit_ts_us"]) == GOLDEN_COMMIT
    assert codec.encode_truncate([16385], 0) == GOLDEN_TRUNCATE


cell_strategy = st.one_of(
    st.tuples(st.just("n"), st.none()),
    st.tuples(st.just("u"), st.none()),
    st.tuples(st.just("t"), st.text(max_size=50)),
)
cells_strategy = st.lists(cell_strategy, min_size=0, max_size=8)


@settings(max_examples=200, deadline=None)
@given(
    rid=st.integers(min_value=1, max_value=2**31 - 1),
    new=cells_strategy,
    old=st.one_of(st.none(), cells_strategy),
    old_kind=st.sampled_from(["K", "O"]),
)
def test_update_roundtrip_property(rid, new, old, old_kind):
    payload = codec.encode_update(rid, new, old, old_kind if old is not None else None)
    m = codec.decode_message(payload)
    assert m["relation_id"] == rid
    assert m["new"] == [(c, v if c == "t" else None) for c, v in new]
    if old is None:
        assert m["old"] is None and m["old_kind"] is None
    else:
        assert m["old_kind"] == old_kind
        assert m["old"] == [(c, v if c == "t" else None) for c, v in old]


@settings(max_examples=100, deadline=None)
@given(
    lsn=st.integers(min_value=0, max_value=2**62),
    ts=st.integers(min_value=0, max_value=2**54),
    xid=st.integers(min_value=1, max_value=2**31 - 1),
)
def test_begin_roundtrip_property(lsn, ts, xid):
    m = codec.decode_message(codec.encode_begin(lsn, ts, xid))
    assert (m["lsn"], m["commit_ts_us"], m["xid"]) == (lsn, ts, xid)


@settings(max_examples=50, deadline=None)
@given(
    rids=st.lists(st.integers(min_value=1, max_value=2**31 - 1), min_size=1, max_size=10),
    bits=st.integers(min_value=0, max_value=3),
)
def test_truncate_roundtrip_property(rids, bits):
    m = codec.decode_message(codec.encode_truncate(rids, bits))
    assert m["relation_ids"] == rids and m["option_bits"] == bits


def test_decode_batch_columnar():
    payloads = [
        GOLDEN_BEGIN,
        GOLDEN_RELATION,
        GOLDEN_INSERT,
        GOLDEN_UPDATE,
        GOLDEN_DELETE,
        GOLDEN_TRUNCATE,
        GOLDEN_COMMIT,
    ]
    cols = codec.decode_batch(payloads)
    assert cols["msg_type"] == ["B", "R", "I", "U", "D", "T", "C"]
    assert cols["relation_id"] == [None, 16385, 16385, 16385, 16385, None, None]
    assert cols["xid"][0] == 491
    assert cols["new_vals"][2] == ["5", "2012-01-01 12:00:00+00"]
    assert cols["new_cats"][2] == ["t", "t"]
    assert cols["old_vals"][4] == ["4", None]
    assert cols["old_cats"][4] == ["t", "n"]
    assert cols["rel_col_names"][1] == ["id", "created"]
    assert cols["trunc_relation_ids"][5] == [16385]
    assert cols["lsn_commit"][6] == 23475352
    # every column same length
    assert {len(v) for v in cols.values()} == {7}


def test_format_type_and_oid_mapping():
    # numeric(10,2): atttypmod = (10<<16 | 2) + 4  (pg catalog encoding)
    assert codec.format_type(1700, (10 << 16 | 2) + 4) == "numeric(10,2)"
    assert codec.format_type(23, -1) == "integer"
    assert codec.spark_type_for_oid(23) == "int"
    assert codec.spark_type_for_oid(1184) == "timestamp"
    assert codec.spark_type_for_oid(1700, (10 << 16 | 2) + 4) == "decimal(10,2)"
    assert codec.spark_type_for_oid(3802) == "string"
