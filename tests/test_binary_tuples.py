"""Binary-mode TupleData ('b' cells — PG14+ ``binary = on`` subscriptions).

The reference pins text mode (its TupleData decoder handles only n/u/t,
reference decoders.py:96-128); with the ``binary`` publication option a
real walsender sends column values in the type's binary *send* format
instead. Both kernels convert 'b' cells to the SAME text spelling the
column would carry in text mode (via the relation registry's column
oids), so binary- and text-mode streams resolve to identical typed
tables. The vectorized kernel converts columnar per type oid
(wal.vdecode._bin_convert) — including numeric (ragged offset-math
digit build) and uuid (nibble-table hex); per-cell Python survives only
for non-canonical numeric encodings PG never emits.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pypgoutput_spark.operators import decode as decode_op
from pypgoutput_spark.plans.registry import RelationRegistry, plain_lookup
from pypgoutput_spark.wal import codec, vdecode

RID = 9001
COLS = [
    (1, "id", 20, -1), (0, "n_int", 23, -1), (0, "flag", 16, -1),
    (0, "score", 701, -1), (0, "ratio", 700, -1), (0, "amount", 1700, 786444),
    (0, "created", 1114, -1), (0, "d", 1082, -1), (0, "uid", 2950, -1),
    (0, "tag", 25, -1), (0, "j", 3802, -1), (0, "sm", 21, -1),
]
OIDS = [c[2] for c in COLS]

ROW1 = ["1", "42", "t", "12345.67", "1.5", "99.9900",
        "1995-03-15 10:30:00.500000", "1995-03-15",
        "12345678-1234-5678-1234-567812345678", "héllo", '{"p": 3}', "-7"]
ROW2 = ["2", "-2147483648", "f", "0.001", "3", "-0.0001",
        "2000-01-01 00:00:00.000000", "2026-08-19",
        "00000000-0000-0000-0000-000000000001", "x", '{"q": [1,2]}', "32767"]


def _bcells(vals, oids=OIDS):
    return [codec.binary_cell(o, v) for o, v in zip(oids, vals)]


def _tcells(vals):
    return [("t", v) if v is not None else ("n", None) for v in vals]


def _plain():
    reg = RelationRegistry()
    reg.add_relation(1, codec.decode_message(
        codec.encode_relation(RID, "public", "metrics", "d", COLS)))
    return reg.to_plain()


def _frames(payload_rows):
    """[(lsn, payload)] in segment 0 → (pandas pdf, arrow rb)."""
    pdf = pd.DataFrame({
        "segment": [0] * len(payload_rows),
        "lsn": [l for l, _ in payload_rows],
        "payload": [p for _, p in payload_rows],
    })
    rb = pa.RecordBatch.from_pydict({
        "segment": pa.array(pdf.segment, type=pa.int64()),
        "lsn": pa.array(pdf.lsn, type=pa.int64()),
        "payload": pa.array([bytes(p) for p in pdf.payload], type=pa.binary()),
    })
    return pdf, rb


def _loop(pdf, plain, strict=True):
    out = decode_op._loop_decode_pdf(pdf.copy(), {}, plain, strict,
                                     decode_op.StreamState())
    return pd.DataFrame(out) if out else pd.DataFrame()


def _vec(rb, plain):
    out = list(vdecode.process_batch(rb, {}, plain))
    return (pa.Table.from_batches(out).to_pandas().sort_values("lsn")
            .reset_index(drop=True)) if out else pd.DataFrame()


def _aslist(x):
    if x is None:
        return None
    if isinstance(x, (list, tuple, np.ndarray)):
        return list(x)
    return None if (isinstance(x, float) and x != x) else x


def _assert_rows_equal(ldf, vdf):
    assert len(ldf) == len(vdf)
    for i in range(len(ldf)):
        for col in ("new_vals", "before_vals", "new_u_masks"):
            assert _aslist(ldf[col].iloc[i]) == _aslist(vdf[col].iloc[i]), (
                i, col, ldf[col].iloc[i], vdf[col].iloc[i])
        for col in ("lsn", "op", "before_kind", "xid", "begin_lsn"):
            a, b = ldf[col].iloc[i], vdf[col].iloc[i]
            assert a == b or (pd.isna(a) and pd.isna(b)), (i, col, a, b)


# ---------------------------------------------------------------------------
# codec golden round trips
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("oid,text", [
    (16, "t"), (16, "f"),
    (21, "-32768"), (21, "32767"),
    (23, "-2147483648"), (23, "2147483647"),
    (20, "-9223372036854775808"), (20, "9223372036854775807"),
    (700, "1.5"), (701, "12345.67"), (701, "-0.001"),
    (25, "héllo wörld"), (1043, ""), (114, '{"a": 1}'),
    (3802, '{"p": [1, 2, 3]}'),
    (1082, "1970-01-01"), (1082, "2026-08-19"),
    (1114, "1995-03-15 10:30:00.500000"), (1184, "2026-08-19 12:00:00.000001"),
    (1700, "12345.6700"), (1700, "-0.0001"), (1700, "0"), (1700, "0.00"),
    (1700, "NaN"), (1700, "10000"), (1700, "99999999.9999"),
    (1700, "-123456789012345678901234567890.123456"),
    (2950, "12345678-1234-5678-1234-567812345678"),
])
def test_binary_cell_roundtrip(oid, text):
    cat, raw = codec.binary_cell(oid, text)
    assert cat == "b"
    assert codec.binary_to_text(oid, raw) == text


def test_binary_cell_null_and_unknown_oid():
    assert codec.binary_cell(23, None) == ("n", None)
    with pytest.raises(ValueError, match="no binary send format"):
        codec.binary_cell(600, "(1,2)")  # point — no converter
    with pytest.raises(ValueError, match="no binary receive format"):
        codec.binary_to_text(600, b"\x00" * 16)


def test_float_spelling_matches_arrow_cast():
    # integral doubles: Arrow prints '3', Python repr '3.0' — the codec
    # must match the vectorized kernel's Arrow spelling
    assert codec.binary_to_text(701, struct.pack(">d", 3.0)) == "3"
    assert codec.binary_to_text(700, struct.pack(">f", 1e30)) == "1e+30"


def test_read_tuple_surfaces_binary_raw():
    ins = codec.encode_insert(RID, _bcells(ROW1))
    cells = codec.decode_message(ins)["new"]
    assert cells[0] == ("b", struct.pack(">q", 1))
    assert cells[9] == ("b", "héllo".encode())


# ---------------------------------------------------------------------------
# kernel parity + text-mode equivalence
# ---------------------------------------------------------------------------

def _typed_stream(cells_fn):
    new = cells_fn(ROW1)
    upd_new = cells_fn(ROW1)
    upd_new[3] = ("t", "99.5")      # mixed categories in one tuple
    upd_new[4] = ("n", None)
    upd_new[10] = ("u", None)       # TOAST-unchanged
    return [
        (1, codec.encode_relation(RID, "public", "metrics", "d", COLS)),
        (10, codec.encode_begin(10, 123456, 777)),
        (11, codec.encode_insert(RID, new)),
        (12, codec.encode_insert(RID, cells_fn(ROW2))),
        (13, codec.encode_update(RID, upd_new,
                                 old_cells=cells_fn([ROW1[0]])[:1] + [("n", None)] * 11,
                                 old_kind="K")),
        (14, codec.encode_delete(RID, cells_fn([ROW2[0]])[:1] + [("n", None)] * 11, "K")),
        (15, codec.encode_commit(15, 16, 123456)),
    ]


def test_kernel_parity_binary_typed():
    plain = _plain()
    pdf, rb = _frames(_typed_stream(_bcells))
    ldf, vdf = _loop(pdf, plain), _vec(rb, plain)
    _assert_rows_equal(ldf, vdf)
    assert _aslist(vdf.new_vals[0]) == ROW1
    # TOAST bit for cell 10 ('u' in the update's new tuple)
    assert _aslist(vdf.new_u_masks[2]) == [1 << 10]
    assert vdf.xid.tolist()[:3] == [777, 777, 777]


def test_binary_mode_equals_text_mode():
    """The SAME logical rows through text-mode and binary-mode frames
    decode to byte-identical RAW events (except float spellings, which
    are normalized to the Arrow cast in BOTH modes here by construction
    of the fixture strings)."""
    plain = _plain()
    _, rb_t = _frames(_typed_stream(_tcells))
    _, rb_b = _frames(_typed_stream(_bcells))
    tdf, bdf = _vec(rb_t, plain), _vec(rb_b, plain)
    assert len(tdf) == len(bdf)
    for i in range(len(tdf)):
        assert _aslist(tdf.new_vals[i]) == _aslist(bdf.new_vals[i]), i
        assert _aslist(tdf.before_vals[i]) == _aslist(bdf.before_vals[i]), i
        assert _aslist(tdf.new_u_masks[i]) == _aslist(bdf.new_u_masks[i]), i


def test_binary_in_streamed_chunk():
    """Binary cells inside a protocol-v2 stream chunk: conversion happens
    after chunk reassembly on both kernels."""
    plain = _plain()
    xid = 4242
    rows = [
        (1, codec.encode_relation(RID, "public", "metrics", "d", COLS)),
        (20, codec.encode_stream_start(xid, True)),
        (21, codec.add_stream_xid(codec.encode_insert(RID, _bcells(ROW1)), xid)),
        (22, codec.add_stream_xid(codec.encode_insert(RID, _bcells(ROW2)), xid)),
        (23, codec.encode_stream_stop()),
        (30, codec.encode_stream_commit(xid, 29, 30, 999000)),
    ]
    pdf, rb = _frames(rows)
    ldf, vdf = _loop(pdf, plain), _vec(rb, plain)
    _assert_rows_equal(ldf, vdf)
    assert vdf.op.tolist() == ["I", "I"]
    assert _aslist(vdf.new_vals[0]) == ROW1
    assert vdf.xid.tolist() == [xid, xid]
    assert vdf.commit_ts_us.tolist() == [999000, 999000]


# ---------------------------------------------------------------------------
# failure modes: loud, typed, and quarantine-eligible
# ---------------------------------------------------------------------------

def _one_insert(cells):
    return [
        (1, codec.encode_relation(RID, "public", "metrics", "d", COLS)),
        (10, codec.encode_begin(10, 0, 1)),
        (11, codec.encode_insert(RID, cells)),
        (12, codec.encode_commit(11, 12, 0)),
    ]


def test_corrupt_binary_width_raises_both_kernels():
    cells = _bcells(ROW1)
    cells[1] = ("b", b"\x00\x01\x02")  # int4 must be 4 bytes
    pdf, rb = _frames(_one_insert(cells))
    plain = _plain()
    with pytest.raises(Exception):
        _loop(pdf, plain, strict=True)
    with pytest.raises(ValueError, match="bad binary cell width|unpack"):
        _vec(rb, plain)
    # strict=False quarantines (op='E'), good frames unaffected
    df = _loop(pdf, plain, strict=False)
    assert df.op.tolist() == ["E"]


def test_bad_jsonb_version_and_bool_raise():
    plain = _plain()
    cells = _bcells(ROW1)
    cells[10] = ("b", b"\x02{}")  # jsonb version must be 1
    _, rb = _frames(_one_insert(cells))
    with pytest.raises(ValueError, match="jsonb"):
        _vec(rb, plain)
    cells = _bcells(ROW1)
    cells[2] = ("b", b"\x07")
    _, rb = _frames(_one_insert(cells))
    with pytest.raises(ValueError, match="boolean"):
        _vec(rb, plain)


def test_unknown_oid_binary_cell_raises():
    cols = COLS[:1] + [(0, "pt", 600, -1)]  # point: no binary converter
    reg = RelationRegistry()
    reg.add_relation(1, codec.decode_message(
        codec.encode_relation(RID, "public", "m2", "d", cols)))
    plain = reg.to_plain()
    rows = [
        (1, codec.encode_relation(RID, "public", "m2", "d", cols)),
        (10, codec.encode_begin(10, 0, 1)),
        (11, codec.encode_insert(RID, [codec.binary_cell(20, "1"), ("b", b"\x00" * 16)])),
        (12, codec.encode_commit(11, 12, 0)),
    ]
    pdf, rb = _frames(rows)
    with pytest.raises(ValueError, match="no binary receive format"):
        _loop(pdf, plain)
    with pytest.raises(ValueError, match="no binary receive format"):
        _vec(rb, plain)


def test_binary_cell_without_registry_oids_raises():
    """Legacy plain form (4-tuples, no oids) + a binary cell → loud."""
    legacy = {RID: [(1, 0, tuple(c[1] for c in COLS), tuple(c[0] for c in COLS))]}
    assert plain_lookup(legacy, RID, 10)[3] is None  # tolerant lookup
    pdf, rb = _frames(_one_insert(_bcells(ROW1)))
    with pytest.raises(ValueError, match="oids"):
        _loop(pdf, legacy)
    with pytest.raises(ValueError, match="oids"):
        _vec(rb, legacy)


def test_binary_cells_across_mid_stream_retype():
    """A Relation re-send retypes a column (int4 → int8); binary cells
    BEFORE the DDL decode with the old width, AFTER with the new — the
    conversion must resolve the LSN-correct schema version's oids on
    both kernels."""
    rid = 9100
    c0 = [(1, "id", 20, -1), (0, "n", 23, -1)]
    c1 = [(1, "id", 20, -1), (0, "n", 20, -1)]
    reg = RelationRegistry()
    reg.add_relation(1, codec.decode_message(
        codec.encode_relation(rid, "public", "t", "d", c0)))
    reg.add_relation(50, codec.decode_message(
        codec.encode_relation(rid, "public", "t", "d", c1)))
    plain = reg.to_plain()
    rows = [
        (1, codec.encode_relation(rid, "public", "t", "d", c0)),
        (10, codec.encode_begin(10, 0, 1)),
        (11, codec.encode_insert(rid, [codec.binary_cell(20, "1"),
                                       codec.binary_cell(23, "7")])),
        (12, codec.encode_commit(11, 12, 0)),
        (50, codec.encode_relation(rid, "public", "t", "d", c1)),
        (60, codec.encode_begin(60, 0, 2)),
        (61, codec.encode_insert(rid, [codec.binary_cell(20, "2"),
                                       codec.binary_cell(20, "9")])),
        (62, codec.encode_commit(61, 62, 0)),
    ]
    pdf, rb = _frames(rows)
    ldf, vdf = _loop(pdf, plain), _vec(rb, plain)
    _assert_rows_equal(ldf, vdf)
    assert _aslist(vdf.new_vals[0]) == ["1", "7"]
    assert _aslist(vdf.new_vals[1]) == ["2", "9"]
    assert vdf.schema_version.tolist() == [0, 1]
    # the pre-DDL width no longer matches post-DDL: a 4-byte cell for
    # the retyped int8 column is a loud width error, not a mis-decode
    bad = [(61, codec.encode_insert(rid, [codec.binary_cell(20, "2"),
                                          codec.binary_cell(23, "9")]))]
    pdf2, rb2 = _frames(rows[:6] + bad + rows[7:])
    with pytest.raises(Exception):
        _vec(rb2, plain)


# ---------------------------------------------------------------------------
# special values: ±infinity / NaN sentinels and range edges (r5 s12)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("oid,text", [
    (1114, "infinity"), (1114, "-infinity"),
    (1184, "infinity"), (1184, "-infinity"),
    (1082, "infinity"), (1082, "-infinity"),
    (1700, "Infinity"), (1700, "-Infinity"),
    (700, "Infinity"), (701, "Infinity"), (701, "-Infinity"), (701, "NaN"),
])
def test_special_value_roundtrip(oid, text):
    """PG's ±infinity sentinels (INT64/32_MAX/MIN for timestamps/dates,
    0xD000/0xF000 numeric sign words, IEEE ±inf/NaN floats) round-trip
    to the exact text-mode spellings — not Arrow's 'inf' or a silent
    '<value out of range: N>' placeholder."""
    cat, raw = codec.binary_cell(oid, text)
    assert cat == "b"
    assert codec.binary_to_text(oid, raw) == text


def test_special_values_kernel_parity():
    """A row carrying timestamp 'infinity', date '-infinity', numeric
    'Infinity', float '-Infinity'/'NaN' decodes to identical PG
    spellings on BOTH kernels, with no placeholder strings."""
    vals = list(ROW1)
    vals[6] = "infinity"      # created (1114)
    vals[7] = "-infinity"     # d (1082)
    vals[5] = "Infinity"      # amount (1700)
    vals[3] = "-Infinity"     # score (701)
    vals[4] = "NaN"           # ratio (700)
    pdf, rb = _frames(_one_insert(_bcells(vals)))
    plain = _plain()
    ldf, vdf = _loop(pdf, plain), _vec(rb, plain)
    _assert_rows_equal(ldf, vdf)
    got = list(vdf.new_vals.iloc[0])
    assert got[6] == "infinity" and got[7] == "-infinity"
    assert got[5] == "Infinity" and got[3] == "-Infinity" and got[4] == "NaN"
    assert not any(v and "out of range" in v for v in got)


def test_timestamp_near_int64_edge_raises_typed():
    """A non-sentinel timestamp Arrow cannot render (within ~292 years
    of the int64 ends) raises a typed corrupt-frame error on both
    kernels — never the '<value out of range: N>' placeholder as data."""
    near = 0x7FFFFFFFFFFFFFFF - 10  # not the sentinel; unrenderable
    cells = _bcells(ROW1)
    cells[6] = ("b", struct.pack(">q", near))
    pdf, rb = _frames(_one_insert(cells))
    plain = _plain()
    with pytest.raises(ValueError, match="out of range"):
        _vec(rb, plain)
    with pytest.raises(ValueError, match="out of range"):
        _loop(pdf, plain, strict=True)


def test_timestamp_beyond_datetime_year_parity():
    """Years past 9999 are legitimate PG values (range to 294276 AD):
    both kernels render them identically through Arrow instead of the
    loop kernel dying on datetime's year ceiling."""
    us_unix = 253402300800000000  # 10000-01-01 00:00:00
    cells = _bcells(ROW1)
    cells[6] = ("b", struct.pack(">q", us_unix - codec.PG_EPOCH_UNIX_US))
    pdf, rb = _frames(_one_insert(cells))
    plain = _plain()
    ldf, vdf = _loop(pdf, plain), _vec(rb, plain)
    _assert_rows_equal(ldf, vdf)
    assert vdf.new_vals.iloc[0][6] == "10000-01-01 00:00:00.000000"


def test_oversized_float_cell_raises_both_kernels():
    """An 8-byte cell for float4 must be a typed width error — np reads
    two floats and taking [0] would silently decode a wrong value."""
    cells = _bcells(ROW1)
    cells[4] = ("b", struct.pack(">ff", 1.5, 99.0))  # ratio is oid 700
    pdf, rb = _frames(_one_insert(cells))
    plain = _plain()
    with pytest.raises(ValueError, match="width"):
        _vec(rb, plain)
    with pytest.raises(ValueError, match="width"):
        _loop(pdf, plain, strict=True)


def test_numeric_trailing_junk_raises_both_kernels():
    """A numeric cell with trailing junk bytes must raise — unpack_from
    would silently ignore the tail and decode a plausible value."""
    _, good = codec.binary_cell(1700, "12.34")
    cells = _bcells(ROW1)
    cells[5] = ("b", good + b"\xff\xff")
    pdf, rb = _frames(_one_insert(cells))
    plain = _plain()
    with pytest.raises(ValueError, match="digit count mismatch"):
        _vec(rb, plain)
    with pytest.raises(ValueError, match="digit count mismatch"):
        _loop(pdf, plain, strict=True)


def test_short_int_cell_raises_typed_error():
    """A truncated int2 cell raises ValueError (the typed-error
    contract), not a bare struct.error."""
    with pytest.raises(ValueError, match="width"):
        codec.binary_to_text(21, b"\x01")


def test_decode_batch_rejects_binary_cells():
    """decode_batch's vals columns are text-typed; a binary=on stream
    must fail loudly there (bytes mixed into string columns corrupt the
    Arrow conversion downstream) and point at the OID-aware kernels."""
    payload = codec.encode_insert(RID, _bcells(ROW1))
    with pytest.raises(ValueError, match="decode_frames_raw"):
        codec.decode_batch([payload])
