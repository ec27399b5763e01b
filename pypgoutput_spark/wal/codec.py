"""pgoutput v1 wire codec: encoder + vectorized batch decoder.

Implements the PostgreSQL logical-replication ``pgoutput`` message grammar
(proto_version 1) as documented in the PostgreSQL protocol docs
(https://www.postgresql.org/docs/current/protocol-logicalrep-message-formats.html).

Behavioral parity targets (reference: dgea005/pypgoutput):
  - message types B/C/O/R/Y/I/U/D/T        (reference src/pypgoutput/decoders.py:131-413)
  - TupleData cell categories n/u/t        (decoders.py:96-128)
  - big-endian *signed* integers           (decoders.py:19-20)
  - PG epoch 2000-01-01 UTC microseconds   (decoders.py:14-16)
  - Update K/O/N state machine             (decoders.py:325-344)
  - Delete requires K or O                 (decoders.py:370-378)
  - Begin xid read as Int32 (the reference calls read_int64 at
    decoders.py:152, which only works via BytesIO short-read on
    well-formed frames; Int32 is spec-correct and behaviorally
    identical on real frames).

This module is pure Python + struct — no Spark imports — so it can run
inside pandas UDF workers and in unit tests without a session.

The batch decoder (`decode_batch`) is the hot kernel: it takes a sequence
of payload byte-strings (one pgoutput message each, as delivered in WAL
frames) and returns columnar lists suitable for zero-copy conversion to
Arrow inside a ``mapInPandas`` stage. Per-message dispatch is a dict jump
on the first byte; field extraction uses ``struct.unpack_from`` over a
memoryview (no BytesIO allocation, no per-field object churn).
"""

from __future__ import annotations

import struct
from datetime import datetime, timedelta, timezone
from typing import Iterable, List, Optional, Sequence, Tuple

PG_EPOCH = datetime(2000, 1, 1, tzinfo=timezone.utc)
# microseconds between unix epoch and PG epoch (2000-01-01)
PG_EPOCH_UNIX_US = 946_684_800_000_000
#: days from Unix epoch (1970-01-01) to PG epoch (2000-01-01)
PG_EPOCH_DAYS = 10957

_I8 = struct.Struct(">b")
_I16 = struct.Struct(">h")
_I32 = struct.Struct(">i")
_I64 = struct.Struct(">q")


class UnsupportedStreamOp(ValueError):
    """A stream-block construct the engine refuses to decode (currently:
    Truncate inside a streamed transaction — its commit/abort is unknown
    when the driver plans the truncate barrier). Deliberately NOT
    eligible for dead-letter quarantine — silently dropping a truncate
    corrupts the table, so the batch fails loudly even with
    strict=False. Shared by the loop kernel (operators.decode) and the
    vectorized kernel (wal.vdecode)."""

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def pg_ts_to_datetime(us: int) -> datetime:
    """PG-epoch microseconds -> aware UTC datetime (decoders.py:14-16 parity)."""
    return PG_EPOCH + timedelta(microseconds=us)


def datetime_to_pg_ts(dt: datetime) -> int:
    return int((dt - PG_EPOCH).total_seconds() * 1_000_000)


def pg_ts_to_unix_us(us: int) -> int:
    """PG-epoch µs -> unix-epoch µs (what Spark TimestampType wants)."""
    return us + PG_EPOCH_UNIX_US


# ---------------------------------------------------------------------------
# encoder (new code — the reference has no encoder; grammar inverse of its
# decoder, used by the deterministic synthetic WAL generator)
# ---------------------------------------------------------------------------


def _cstring(s: str) -> bytes:
    return s.encode("utf-8") + b"\x00"


def encode_tuple_data(cells: Sequence[Tuple[str, Optional[object]]]) -> bytes:
    """cells: [(category, value)] with category in {'n','u','t','b'}.

    't' cells carry a text value; 'b' cells (PG14+ ``binary = on``
    subscriptions) carry the type's binary *send* format as bytes (use
    :func:`binary_cell` to build one from text); 'n' (NULL) and 'u'
    (unchanged TOAST) carry none.
    """
    out = [_I16.pack(len(cells))]
    for category, value in cells:
        if category in ("n", "u"):
            out.append(category.encode("ascii"))
        elif category == "t":
            v = (value or "").encode("utf-8")
            out.append(b"t" + _I32.pack(len(v)) + v)
        elif category == "b":
            if not isinstance(value, (bytes, bytearray)):
                raise ValueError("'b' cells carry bytes (see binary_cell)")
            out.append(b"b" + _I32.pack(len(value)) + bytes(value))
        else:
            raise ValueError(f"bad tuple cell category {category!r}")
    return b"".join(out)


def encode_begin(lsn: int, commit_ts_us: int, xid: int) -> bytes:
    return b"B" + _I64.pack(lsn) + _I64.pack(commit_ts_us) + _I32.pack(xid)


def encode_commit(lsn_commit: int, lsn_end: int, commit_ts_us: int, flags: int = 0) -> bytes:
    return b"C" + _I8.pack(flags) + _I64.pack(lsn_commit) + _I64.pack(lsn_end) + _I64.pack(commit_ts_us)


def encode_relation(
    relation_id: int,
    namespace: str,
    relation_name: str,
    replica_identity: str,
    columns: Sequence[Tuple[int, str, int, int]],
) -> bytes:
    """columns: [(part_of_pkey, name, type_oid, atttypmod)]."""
    out = [
        b"R",
        _I32.pack(relation_id),
        _cstring(namespace),
        _cstring(relation_name),
        replica_identity.encode("ascii"),
        _I16.pack(len(columns)),
    ]
    for pkey, name, oid, typmod in columns:
        out.append(_I8.pack(pkey) + _cstring(name) + _I32.pack(oid) + _I32.pack(typmod))
    return b"".join(out)


def encode_insert(relation_id: int, new_cells: Sequence[Tuple[str, Optional[str]]]) -> bytes:
    return b"I" + _I32.pack(relation_id) + b"N" + encode_tuple_data(new_cells)


def encode_update(
    relation_id: int,
    new_cells: Sequence[Tuple[str, Optional[str]]],
    old_cells: Optional[Sequence[Tuple[str, Optional[str]]]] = None,
    old_kind: Optional[str] = None,
) -> bytes:
    out = [b"U", _I32.pack(relation_id)]
    if old_cells is not None:
        if old_kind not in ("K", "O"):
            raise ValueError("old_kind must be 'K' or 'O' when old_cells given")
        out.append(old_kind.encode("ascii"))
        out.append(encode_tuple_data(old_cells))
    out.append(b"N")
    out.append(encode_tuple_data(new_cells))
    return b"".join(out)


def encode_delete(
    relation_id: int,
    old_cells: Sequence[Tuple[str, Optional[str]]],
    kind: str = "K",
) -> bytes:
    if kind not in ("K", "O"):
        raise ValueError("delete kind must be 'K' or 'O'")
    return b"D" + _I32.pack(relation_id) + kind.encode("ascii") + encode_tuple_data(old_cells)


def encode_origin(origin_commit_lsn: int, origin_name: str) -> bytes:
    """Origin message 'O': the commit LSN on the ORIGIN node plus the
    replication-origin name. PG sends it right after Begin (or inside a
    stream's first chunk) for transactions whose rows were replicated
    from another node — the loop-prevention signal in active-active."""
    return b"O" + _I64.pack(origin_commit_lsn) + _cstring(origin_name)


def encode_truncate(relation_ids: Sequence[int], option_bits: int = 0) -> bytes:
    out = [b"T", _I32.pack(len(relation_ids)), _I8.pack(option_bits)]
    for rid in relation_ids:
        out.append(_I32.pack(rid))
    return b"".join(out)


def encode_logical_message(transactional: bool, lsn: int, prefix: str,
                           content: bytes) -> bytes:
    """Logical decoding message 'M' (``pg_logical_emit_message`` — the
    transactional-outbox carrier): flags Int8 (bit 0 = transactional),
    the message's WAL LSN, a cstring prefix, then length-framed content
    bytes. Grammar per the published logical-replication message spec;
    the reference decoder predates 'M' support, so this is parity-plus
    (like the v2 stream grammar)."""
    return (b"M" + _I8.pack(1 if transactional else 0) + _I64.pack(lsn)
            + _cstring(prefix) + _I32.pack(len(content)) + content)


# ---- two-phase commit (PG15+ ``two_phase`` slot option) -------------------
# (Grammar per the published logical-replication message spec: a prepared
# transaction's body arrives between Begin Prepare 'b' and Prepare 'P' —
# the exact B..C body grammar — and its DECISION arrives later, possibly
# much later, as Commit Prepared 'K' or Rollback Prepared 'r'. Stream
# Prepare 'p' is the streamed-transaction spelling of 'P'. The reference
# decoder predates two-phase support (decoders.py handles B/C/O/R/Y/I/U/
# D/T only), so this is parity-plus, like 'M' and the v2 stream grammar.)


def encode_begin_prepare(prepare_lsn: int, end_lsn: int, prepare_ts_us: int,
                         xid: int, gid: str) -> bytes:
    return (b"b" + struct.pack(">qqq", prepare_lsn, end_lsn, prepare_ts_us)
            + _I32.pack(xid) + _cstring(gid))


def encode_prepare(prepare_lsn: int, end_lsn: int, prepare_ts_us: int,
                   xid: int, gid: str, flags: int = 0) -> bytes:
    return (b"P" + _I8.pack(flags)
            + struct.pack(">qqq", prepare_lsn, end_lsn, prepare_ts_us)
            + _I32.pack(xid) + _cstring(gid))


def encode_commit_prepared(commit_lsn: int, end_lsn: int, commit_ts_us: int,
                           xid: int, gid: str, flags: int = 0) -> bytes:
    return (b"K" + _I8.pack(flags)
            + struct.pack(">qqq", commit_lsn, end_lsn, commit_ts_us)
            + _I32.pack(xid) + _cstring(gid))


def encode_rollback_prepared(prepare_end_lsn: int, rollback_end_lsn: int,
                             prepare_ts_us: int, rollback_ts_us: int,
                             xid: int, gid: str, flags: int = 0) -> bytes:
    return (b"r" + _I8.pack(flags)
            + struct.pack(">qqqq", prepare_end_lsn, rollback_end_lsn,
                          prepare_ts_us, rollback_ts_us)
            + _I32.pack(xid) + _cstring(gid))


def encode_stream_prepare(prepare_lsn: int, end_lsn: int, prepare_ts_us: int,
                          xid: int, gid: str, flags: int = 0) -> bytes:
    return (b"p" + _I8.pack(flags)
            + struct.pack(">qqq", prepare_lsn, end_lsn, prepare_ts_us)
            + _I32.pack(xid) + _cstring(gid))


# ---- protocol v2: streamed in-progress transactions -----------------------
# (PostgreSQL 14+ `streaming = on`: large transactions stream in chunks
# before commit. Grammar per the published logical-replication message
# spec: Stream Start 'S', Stream Stop 'E', Stream Commit 'c', Stream
# Abort 'A'; every message INSIDE a stream block carries an Int32 xid
# right after the type byte.)


def encode_stream_start(xid: int, first_segment: bool = True) -> bytes:
    return b"S" + _I32.pack(xid) + _I8.pack(1 if first_segment else 0)


def encode_stream_stop() -> bytes:
    return b"E"


def encode_stream_commit(xid: int, lsn_commit: int, lsn_end: int,
                         commit_ts_us: int, flags: int = 0) -> bytes:
    return (b"c" + _I32.pack(xid) + _I8.pack(flags) + _I64.pack(lsn_commit)
            + _I64.pack(lsn_end) + _I64.pack(commit_ts_us))


def encode_stream_abort(xid: int, subxid: Optional[int] = None,
                        abort_lsn: Optional[int] = None,
                        abort_ts_us: Optional[int] = None) -> bytes:
    """Stream Abort 'A'. With ``abort_lsn``/``abort_ts_us`` set (both or
    neither), emits the protocol-v4 form (PG16 ``streaming = parallel``):
    the v2 body plus the abort LSN and abort timestamp — parallel apply
    workers need them to truncate their already-applied prefix."""
    out = b"A" + _I32.pack(xid) + _I32.pack(xid if subxid is None else subxid)
    if (abort_lsn is None) != (abort_ts_us is None):
        raise ValueError("v4 Stream Abort needs BOTH abort_lsn and abort_ts_us")
    if abort_lsn is not None:
        out += _I64.pack(abort_lsn) + _I64.pack(abort_ts_us)
    return out


def add_stream_xid(payload: bytes, xid: int) -> bytes:
    """Wrap a v1 DML payload as its in-stream v2 form (xid after byte1)."""
    return payload[0:1] + _I32.pack(xid) + payload[1:]


def strip_stream_xid(payload: bytes) -> Tuple[int, bytes]:
    """In-stream v2 DML payload → (xid, equivalent v1 payload)."""
    (xid,) = _I32.unpack_from(payload, 1)
    return xid, payload[0:1] + payload[5:]


# ---------------------------------------------------------------------------
# decoder — single message (spec-shaped dicts; unit-test surface)
# ---------------------------------------------------------------------------


def _read_tuple(mv: memoryview, pos: int) -> Tuple[List[Tuple[str, Optional[str]]], int]:
    """Parse one TupleData; returns (cells, new_pos).

    Cell = (category, value); value is None for 'n'/'u'.
    """
    (n_columns,) = _I16.unpack_from(mv, pos)
    pos += 2
    cells: List[Tuple[str, Optional[str]]] = []
    for _ in range(n_columns):
        cat = chr(mv[pos])
        pos += 1
        if cat == "t":
            (ln,) = _I32.unpack_from(mv, pos)
            pos += 4
            cells.append(("t", bytes(mv[pos : pos + ln]).decode("utf-8")))
            pos += ln
        elif cat == "b":  # binary-mode cell: surfaced raw (OID unknown here;
            # the decode kernels convert via the relation registry)
            (ln,) = _I32.unpack_from(mv, pos)
            pos += 4
            cells.append(("b", bytes(mv[pos : pos + ln])))
            pos += ln
        elif cat in ("n", "u"):
            cells.append((cat, None))
        else:
            raise ValueError(f"bad TupleData category byte {cat!r} at {pos - 1}")
    return cells, pos


def _read_cstring(mv: memoryview, pos: int) -> Tuple[str, int]:
    end = pos
    while mv[end] != 0:
        end += 1
    return bytes(mv[pos:end]).decode("utf-8"), end + 1


def decode_message(payload: bytes) -> dict:
    """Decode one pgoutput message to a spec-shaped dict.

    Keys always present: ``msg_type``. Others per type — mirrors the
    fields asserted by the reference's decoder unit tests
    (tests/test_decoders.py:8-136).
    """
    mv = memoryview(payload)
    t = chr(mv[0])
    pos = 1
    if t == "B":
        lsn, ts = _I64.unpack_from(mv, pos)[0], _I64.unpack_from(mv, pos + 8)[0]
        (xid,) = _I32.unpack_from(mv, pos + 16)
        return {"msg_type": "B", "lsn": lsn, "commit_ts_us": ts, "xid": xid}
    if t == "C":
        (flags,) = _I8.unpack_from(mv, pos)
        lsn_commit, lsn_end, ts = struct.unpack_from(">qqq", mv, pos + 1)
        return {
            "msg_type": "C",
            "flags": flags,
            "lsn_commit": lsn_commit,
            "lsn_end": lsn_end,
            "commit_ts_us": ts,
        }
    if t == "O":
        # Origin: the transaction's rows were originally replicated FROM
        # another node (replication-origin tracking). The reference stubs
        # it (decoders.py:191-200); this engine decodes the body so the
        # pipeline can SKIP foreign-origin transactions (loop prevention
        # in active-active meshes — the reason PG sends the message).
        # Tolerate the bare 1-byte form for old synthetic streams.
        if len(mv) < 10:
            return {"msg_type": "O"}
        (oc_lsn,) = _I64.unpack_from(mv, pos)
        name, _ = _read_cstring(mv, pos + 8)
        return {"msg_type": "O", "origin_commit_lsn": oc_lsn,
                "origin_name": name}
    if t == "Y":  # type — ignored, parity with reference stub (decoders.py:264-274)
        return {"msg_type": "Y"}
    if t == "R":
        (relation_id,) = _I32.unpack_from(mv, pos)
        pos += 4
        namespace, pos = _read_cstring(mv, pos)
        relation_name, pos = _read_cstring(mv, pos)
        replica_identity = chr(mv[pos])
        pos += 1
        (n_columns,) = _I16.unpack_from(mv, pos)
        pos += 2
        cols = []
        for _ in range(n_columns):
            (pkey,) = _I8.unpack_from(mv, pos)
            pos += 1
            name, pos = _read_cstring(mv, pos)
            oid, typmod = struct.unpack_from(">ii", mv, pos)
            pos += 8
            cols.append({"part_of_pkey": pkey, "name": name, "type_id": oid, "atttypmod": typmod})
        return {
            "msg_type": "R",
            "relation_id": relation_id,
            "namespace": namespace,
            "relation_name": relation_name,
            "replica_identity": replica_identity,
            "columns": cols,
        }
    if t == "I":
        (relation_id,) = _I32.unpack_from(mv, pos)
        pos += 4
        marker = chr(mv[pos])
        if marker != "N":
            raise ValueError(f"Insert expects 'N' tuple marker, got {marker!r}")
        cells, pos = _read_tuple(mv, pos + 1)
        return {"msg_type": "I", "relation_id": relation_id, "new": cells}
    if t == "U":
        (relation_id,) = _I32.unpack_from(mv, pos)
        pos += 4
        marker = chr(mv[pos])
        pos += 1
        old_kind = None
        old_cells = None
        if marker in ("K", "O"):
            old_kind = marker
            old_cells, pos = _read_tuple(mv, pos)
            marker = chr(mv[pos])
            pos += 1
        if marker != "N":
            raise ValueError(f"Update missing 'N' new-tuple marker at {pos - 1}, got {marker!r}")
        cells, pos = _read_tuple(mv, pos)
        return {
            "msg_type": "U",
            "relation_id": relation_id,
            "old_kind": old_kind,
            "old": old_cells,
            "new": cells,
        }
    if t == "D":
        (relation_id,) = _I32.unpack_from(mv, pos)
        pos += 4
        kind = chr(mv[pos])
        pos += 1
        if kind not in ("K", "O"):
            raise ValueError(f"Delete tuple kind must be 'K' or 'O', got {kind!r}")
        cells, pos = _read_tuple(mv, pos)
        return {"msg_type": "D", "relation_id": relation_id, "old_kind": kind, "old": cells}
    if t == "T":
        # typed errors for truncation/corruption, never struct.error:
        # length-check BEFORE unpacking n_rel, then bound the relid list
        if len(mv) < pos + 5:
            raise ValueError(
                f"truncated pgoutput 'T' message ({len(mv)} bytes; corrupt frame)"
            )
        (n_rel,) = _I32.unpack_from(mv, pos)
        if n_rel < 0 or pos + 5 + 4 * n_rel > len(mv):
            raise ValueError(
                f"Truncate relation list overruns the frame "
                f"(n_rel={n_rel}, {len(mv)} bytes; corrupt frame)"
            )
        (option_bits,) = _I8.unpack_from(mv, pos + 4)
        rids = list(struct.unpack_from(f">{n_rel}i", mv, pos + 5))
        return {"msg_type": "T", "option_bits": option_bits, "relation_ids": rids}
    if t == "M":  # logical decoding message (pg_logical_emit_message)
        if len(mv) < 15:
            raise ValueError(
                f"truncated pgoutput 'M' message ({len(mv)} bytes; corrupt frame)"
            )
        (flags,) = _I8.unpack_from(mv, pos)
        (msg_lsn,) = _I64.unpack_from(mv, pos + 1)
        nul = bytes(mv).find(b"\x00", pos + 9)
        if nul < 0 or nul + 5 > len(mv):
            raise ValueError(
                "Message prefix/length overruns the frame (corrupt frame)"
            )
        prefix, pos = _read_cstring(mv, pos + 9)
        (clen,) = _I32.unpack_from(mv, pos)
        pos += 4
        if clen < 0 or pos + clen > len(mv):
            raise ValueError(
                f"Message content overruns the frame (len={clen}, "
                f"{len(mv)} bytes; corrupt frame)"
            )
        return {
            "msg_type": "M",
            "flags": flags,
            "transactional": bool(flags & 1),
            "message_lsn": msg_lsn,
            "prefix": prefix,
            "content": bytes(mv[pos : pos + clen]),
        }
    if t == "S":  # protocol v2: Stream Start
        (xid,) = _I32.unpack_from(mv, pos)
        (first,) = _I8.unpack_from(mv, pos + 4)
        return {"msg_type": "S", "xid": xid, "first_segment": bool(first)}
    if t == "E":  # Stream Stop (chunk end)
        return {"msg_type": "E"}
    if t == "c":  # Stream Commit
        (xid,) = _I32.unpack_from(mv, pos)
        (flags,) = _I8.unpack_from(mv, pos + 4)
        lsn_commit, lsn_end, ts = struct.unpack_from(">qqq", mv, pos + 5)
        return {
            "msg_type": "c", "xid": xid, "flags": flags,
            "lsn_commit": lsn_commit, "lsn_end": lsn_end, "commit_ts_us": ts,
        }
    if t == "A":  # Stream Abort (v2: xid+subxid; v4 adds lsn+ts)
        xid, subxid = struct.unpack_from(">ii", mv, pos)
        out = {"msg_type": "A", "xid": xid, "subxid": subxid}
        if len(mv) >= pos + 24:  # protocol v4 (PG16 streaming=parallel)
            a_lsn, a_ts = struct.unpack_from(">qq", mv, pos + 8)
            out["abort_lsn"] = a_lsn
            out["abort_ts_us"] = a_ts
        return out
    if t in ("b", "P", "K", "r", "p"):  # two-phase commit family
        def _gid(at: int) -> str:
            if at + 1 > len(mv):
                raise ValueError(
                    f"truncated pgoutput {t!r} message ({len(mv)} bytes; "
                    "corrupt frame)"
                )
            end = bytes(mv).find(b"\x00", at)
            if end < 0:
                raise ValueError(
                    f"two-phase gid overruns the frame in {t!r} message "
                    "(corrupt frame)"
                )
            return bytes(mv[at:end]).decode("utf-8")

        if t == "b":  # Begin Prepare: qqq + xid + gid
            if len(mv) < 30:
                raise ValueError(
                    f"truncated pgoutput 'b' message ({len(mv)} bytes; "
                    "corrupt frame)"
                )
            plsn, elsn, ts = struct.unpack_from(">qqq", mv, pos)
            (xid,) = _I32.unpack_from(mv, pos + 24)
            return {
                "msg_type": "b", "prepare_lsn": plsn, "end_lsn": elsn,
                "prepare_ts_us": ts, "xid": xid, "gid": _gid(pos + 28),
            }
        if t == "r":  # Rollback Prepared: flags + qqqq + xid + gid
            if len(mv) < 39:
                raise ValueError(
                    f"truncated pgoutput 'r' message ({len(mv)} bytes; "
                    "corrupt frame)"
                )
            (flags,) = _I8.unpack_from(mv, pos)
            pelsn, relsn, pts, rts = struct.unpack_from(">qqqq", mv, pos + 1)
            (xid,) = _I32.unpack_from(mv, pos + 33)
            return {
                "msg_type": "r", "flags": flags,
                "prepare_end_lsn": pelsn, "rollback_end_lsn": relsn,
                "prepare_ts_us": pts, "rollback_ts_us": rts,
                "xid": xid, "gid": _gid(pos + 37),
            }
        # 'P' / 'K' / 'p': flags + qqq + xid + gid
        if len(mv) < 31:
            raise ValueError(
                f"truncated pgoutput {t!r} message ({len(mv)} bytes; "
                "corrupt frame)"
            )
        (flags,) = _I8.unpack_from(mv, pos)
        lsn_a, lsn_b, ts = struct.unpack_from(">qqq", mv, pos + 1)
        (xid,) = _I32.unpack_from(mv, pos + 25)
        out = {"msg_type": t, "flags": flags, "end_lsn": lsn_b,
               "xid": xid, "gid": _gid(pos + 29)}
        if t == "K":
            out["commit_lsn"], out["commit_ts_us"] = lsn_a, ts
        else:  # 'P' / 'p'
            out["prepare_lsn"], out["prepare_ts_us"] = lsn_a, ts
        return out
    raise ValueError(f"unknown pgoutput message type byte {t!r}")


# ---------------------------------------------------------------------------
# decoder — batch kernel (columnar output for the Spark decode stage)
# ---------------------------------------------------------------------------

#: columnar field order produced by decode_batch
BATCH_FIELDS = (
    "msg_type",      # str
    "relation_id",   # int | None
    "xid",           # int | None         (B)
    "begin_lsn",     # int | None         (B)
    "commit_ts_us",  # int | None         (B and C)
    "lsn_commit",    # int | None         (C)
    "lsn_end",       # int | None         (C)
    "old_kind",      # 'K'|'O'|None       (U, D)
    "old_cats",      # list[str] | None   per-column category
    "old_vals",      # list[str|None] | None
    "new_cats",      # list[str] | None
    "new_vals",      # list[str|None] | None
    "rel_namespace",    # str | None      (R)
    "rel_name",         # str | None      (R)
    "rel_replident",    # str | None      (R)
    "rel_col_pkeys",    # list[int] | None (R)
    "rel_col_names",    # list[str] | None (R)
    "rel_col_oids",     # list[int] | None (R)
    "rel_col_typmods",  # list[int] | None (R)
    "trunc_option_bits",  # int | None    (T)
    "trunc_relation_ids",  # list[int] | None (T)
)


def decode_batch(payloads: Iterable[bytes]) -> dict:
    """Decode a batch of pgoutput messages into columnar lists.

    This is the kernel invoked from the Spark ``mapInPandas`` decode stage
    (one call per Arrow batch — no per-row Python crosses the Spark
    boundary; the loop here runs at native-extension speed for field
    extraction via struct unpack over memoryviews).
    """
    cols: dict = {f: [] for f in BATCH_FIELDS}
    ap = {f: cols[f].append for f in BATCH_FIELDS}

    for payload in payloads:
        m = decode_message(payload)
        t = m["msg_type"]
        ap["msg_type"](t)
        ap["relation_id"](m.get("relation_id"))
        ap["xid"](m.get("xid"))
        ap["begin_lsn"](m["lsn"] if t == "B" else None)
        ap["commit_ts_us"](m.get("commit_ts_us"))
        ap["lsn_commit"](m.get("lsn_commit"))
        ap["lsn_end"](m.get("lsn_end"))
        ap["old_kind"](m.get("old_kind"))
        old = m.get("old")
        new = m.get("new")
        for cells in (old, new):
            if cells is not None and any(c == "b" for c, _ in cells):
                # 'b' cells carry raw bytes (decode_message's documented
                # surface) but THIS columnar surface types vals as text —
                # mixing bytes into it would corrupt Arrow conversion
                # downstream; binary=on streams need the registry-aware
                # kernels (decode_frames_raw) for per-OID conversion
                raise ValueError(
                    "binary-mode ('b') TupleData cell in decode_batch: "
                    "vals columns are text-typed — decode binary=on "
                    "streams via decode_frames_raw (OID-aware), or read "
                    "raw cells from decode_message"
                )
        ap["old_cats"]([c for c, _ in old] if old is not None else None)
        ap["old_vals"]([v for _, v in old] if old is not None else None)
        ap["new_cats"]([c for c, _ in new] if new is not None else None)
        ap["new_vals"]([v for _, v in new] if new is not None else None)
        if t == "R":
            rc = m["columns"]
            ap["rel_namespace"](m["namespace"])
            ap["rel_name"](m["relation_name"])
            ap["rel_replident"](m["replica_identity"])
            ap["rel_col_pkeys"]([c["part_of_pkey"] for c in rc])
            ap["rel_col_names"]([c["name"] for c in rc])
            ap["rel_col_oids"]([c["type_id"] for c in rc])
            ap["rel_col_typmods"]([c["atttypmod"] for c in rc])
        else:
            ap["rel_namespace"](None)
            ap["rel_name"](None)
            ap["rel_replident"](None)
            ap["rel_col_pkeys"](None)
            ap["rel_col_names"](None)
            ap["rel_col_oids"](None)
            ap["rel_col_typmods"](None)
        if t == "T":
            ap["trunc_option_bits"](m["option_bits"])
            ap["trunc_relation_ids"](m["relation_ids"])
        else:
            ap["trunc_option_bits"](None)
            ap["trunc_relation_ids"](None)
    return cols


# ---------------------------------------------------------------------------
# PG type OID -> Spark type mapping (replaces the reference's live catalog
# lookups, utils.py:54-69 / reader.py:87-98)
# ---------------------------------------------------------------------------

# OIDs from pg_type; the subset the reference exercises plus common scalars.
PG_OID_NAMES = {
    16: "boolean",
    20: "bigint",
    21: "smallint",
    23: "integer",
    25: "text",
    114: "json",
    700: "real",
    701: "double precision",
    1043: "character varying",
    1082: "date",
    1114: "timestamp without time zone",
    1184: "timestamp with time zone",
    1700: "numeric",
    3802: "jsonb",
    2950: "uuid",
}


def format_type(oid: int, atttypmod: int) -> str:
    """Render a PG type name like the catalog's format_type() would
    (reference utils.py:54-58), incl. numeric(p,s) from atttypmod."""
    name = PG_OID_NAMES.get(oid, "unknown")
    if oid == 1700 and atttypmod >= 4:
        mod = atttypmod - 4
        precision, scale = (mod >> 16) & 0xFFFF, mod & 0xFFFF
        return f"numeric({precision},{scale})"
    if oid == 1043 and atttypmod >= 4:
        return f"character varying({atttypmod - 4})"
    return name


def spark_type_for_oid(oid: int, atttypmod: int = -1) -> str:
    """OID -> Spark SQL type string (DDL format)."""
    if oid in (20,):
        return "bigint"
    if oid in (23,):
        return "int"
    if oid in (21,):
        return "smallint"
    if oid == 16:
        return "boolean"
    if oid in (700,):
        return "float"
    if oid in (701,):
        return "double"
    if oid in (1114, 1184):
        return "timestamp"
    if oid == 1082:
        return "date"
    if oid == 1700 and atttypmod >= 4:
        mod = atttypmod - 4
        return f"decimal({(mod >> 16) & 0xFFFF},{mod & 0xFFFF})"
    # text, varchar, json(b), uuid, unknown -> string (reader.py:97-98 parity)
    return "string"


# ---------------------------------------------------------------------------
# binary-mode TupleData cells (PG14+ ``binary = on`` subscriptions)
#
# With the ``binary`` publication option, the walsender sends column
# values in the type's binary *send* format (category byte 'b' + Int32
# length + the bytes pg_type.typsend would produce) instead of text
# ('t'). The reference pins text mode (its decoders handle only n/u/t —
# reference decoders.py:96-128); this engine decodes both. All formats
# below are the public PostgreSQL wire representations (protocol docs +
# the types' documented send functions). Types without a converter here
# raise — a real subscriber falls back to text for such columns, so an
# unknown-'b' cell is a corrupt or unsupported stream, not a skippable
# value.
# ---------------------------------------------------------------------------

_F4 = struct.Struct(">f")
_F8 = struct.Struct(">d")

#: OIDs whose binary form IS the UTF-8 text (raw passthrough)
BINARY_TEXT_OIDS = frozenset({25, 1043, 114})


def _numeric_to_binary(text: str) -> bytes:
    """Decimal text → PG binary ``numeric``: ndigits/weight/sign/dscale
    Int16 header + base-10000 digit groups, most significant first."""
    from decimal import Decimal

    d = Decimal(text)
    if d.is_nan():
        return struct.pack(">hhHh", 0, 0, 0xC000, 0)
    if d.is_infinite():
        # PG14+ numeric ±Infinity: dedicated sign words, no digit groups
        return struct.pack(">hhHh", 0, 0, 0xD000 if d > 0 else 0xF000, 0)
    t = d.as_tuple()  # exact — Decimal arithmetic would round at context prec
    sign = 0x4000 if t.sign else 0x0000
    dscale = max(0, -t.exponent)
    digits = "".join(map(str, t.digits))
    if t.exponent > 0:  # e.g. 1E+3 — materialize the trailing zeros
        digits += "0" * t.exponent
        frac = ""
        intp = digits
    else:
        cut = len(digits) - dscale
        intp = digits[:cut] if cut > 0 else ""
        frac = ("0" * -cut + digits) if cut < 0 else digits[cut:]
    intp = intp.lstrip("0")
    intp = "0" * (-len(intp) % 4) + intp         # left-pad to 4-groups
    frac = frac + "0" * (-len(frac) % 4)         # right-pad to 4-groups
    groups = [int(intp[i : i + 4]) for i in range(0, len(intp), 4)]
    weight = len(groups) - 1
    groups += [int(frac[i : i + 4]) for i in range(0, len(frac), 4)]
    # strip leading zero groups (weight counts from the first nonzero)
    while groups and groups[0] == 0:
        groups.pop(0)
        weight -= 1
    while groups and groups[-1] == 0:            # trailing zero groups
        groups.pop()
    if not groups:
        return struct.pack(">hhHh", 0, 0, sign, dscale)
    return struct.pack(">hhHh", len(groups), weight, sign, dscale) + struct.pack(
        f">{len(groups)}h", *groups
    )


def _binary_to_numeric_text(raw: bytes) -> str:
    """PG binary ``numeric`` → the text PG would print (dscale decimals)."""
    from decimal import Decimal

    if len(raw) < 8:
        raise ValueError("truncated binary numeric cell (corrupt frame)")
    ndigits, weight, sign, dscale = struct.unpack_from(">hhHh", raw, 0)
    if sign == 0xC000:
        return "NaN"
    if sign == 0xD000:  # PG14+ numeric ±Infinity sign words
        return "Infinity"
    if sign == 0xF000:
        return "-Infinity"
    if sign not in (0x0000, 0x4000):
        raise ValueError(f"bad numeric sign word 0x{sign:04x}")
    if ndigits < 0 or len(raw) != 8 + 2 * ndigits:
        # trailing junk or a short digit list would otherwise silently
        # decode to a wrong value (np/struct read only what they need)
        raise ValueError("binary numeric digit count mismatch (corrupt frame)")
    groups = struct.unpack_from(f">{ndigits}h", raw, 8)
    from decimal import localcontext

    with localcontext() as ctx:
        ctx.prec = 4 * (ndigits + abs(weight) + 2) + dscale + 10
        val = Decimal(0)
        for i, g in enumerate(groups):
            if not 0 <= g <= 9999:
                raise ValueError(f"numeric digit group {g} out of base-10000 range")
            val += Decimal(g).scaleb(4 * (weight - i))
        val = val.quantize(Decimal(1).scaleb(-dscale))
    if sign == 0x4000:
        val = val.copy_negate()  # exact — '-' would round at context prec
    return format(val, "f")


def _pg_ts_text(us: int) -> str:
    """PG-epoch µs → 'YYYY-MM-DD HH:MM:SS.ffffff' (UTC, naive render —
    the engine normalizes timestamptz to UTC). Always prints the 6-digit
    fraction: byte-parity with the vectorized kernel's Arrow
    timestamp→string cast (CASTs identically either way)."""
    dt = PG_EPOCH + timedelta(microseconds=us)
    return dt.strftime("%Y-%m-%d %H:%M:%S") + f".{dt.microsecond:06d}"


def _arrow_ts_text(us: int) -> str:
    """PG-epoch µs → text via Arrow's timestamp cast — the spelling the
    vectorized kernel produces; used for values outside datetime's year
    range (1..9999), which Arrow renders fine ('10000-01-01 …') except
    within ~292 years of the int64 ends, where its cast yields a
    placeholder — surfaced as a typed corrupt-frame error, never as
    column data."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if us > 0x7FFFFFFFFFFFFFFF - PG_EPOCH_UNIX_US:
        raise ValueError("binary timestamp out of range (corrupt frame)")
    s = pc.cast(
        pc.cast(pa.array([us + PG_EPOCH_UNIX_US]), pa.timestamp("us")),
        pa.string(),
    )[0].as_py()
    if s.startswith("<value out of range"):
        raise ValueError("binary timestamp out of range (corrupt frame)")
    return s


def _pg_date_text(days: int) -> str:
    """PG-epoch days → 'YYYY-MM-DD' (caller handles the ±infinity
    sentinels). datetime covers years 1..9999; outside that, render
    through Arrow like the vectorized kernel (typed error at the int32
    extremes Arrow cannot render)."""
    try:
        return (PG_EPOCH + timedelta(days=days)).strftime("%Y-%m-%d")
    except OverflowError:
        import pyarrow as pa
        import pyarrow.compute as pc

        if days > 0x7FFFFFFF - PG_EPOCH_DAYS:
            raise ValueError("binary date out of range (corrupt frame)")
        s = pc.cast(
            pc.cast(pa.array([days + PG_EPOCH_DAYS], type=pa.int32()),
                    pa.date32()),
            pa.string(),
        )[0].as_py()
        if s.startswith("<value out of range"):
            raise ValueError("binary date out of range (corrupt frame)")
        return s


def binary_cell(oid: int, text: Optional[str]) -> Tuple[str, Optional[bytes]]:
    """Text value → a ('b', bytes) TupleData cell in the type's binary
    send format (None → ('n', None)). The generator-side inverse of
    :func:`binary_to_text`."""
    if text is None:
        return ("n", None)
    if oid in BINARY_TEXT_OIDS:
        return ("b", text.encode("utf-8"))
    if oid == 3802:  # jsonb: 1-byte version header, then the JSON text
        return ("b", b"\x01" + text.encode("utf-8"))
    if oid == 16:
        if text not in ("t", "f", "true", "false", "1", "0"):
            raise ValueError(f"bad boolean text {text!r}")
        return ("b", b"\x01" if text in ("t", "true", "1") else b"\x00")
    if oid == 21:
        return ("b", _I16.pack(int(text)))
    if oid == 23:
        return ("b", _I32.pack(int(text)))
    if oid == 20:
        return ("b", _I64.pack(int(text)))
    if oid == 700:
        return ("b", _F4.pack(float(text)))
    if oid == 701:
        return ("b", _F8.pack(float(text)))
    if oid == 1082:
        if text == "infinity":  # PG date ±infinity sentinels
            return ("b", _I32.pack(0x7FFFFFFF))
        if text == "-infinity":
            return ("b", _I32.pack(-0x80000000))
        d = datetime.fromisoformat(text + "T00:00:00").replace(tzinfo=timezone.utc)
        return ("b", _I32.pack((d - PG_EPOCH).days))
    if oid in (1114, 1184):
        if text == "infinity":  # PG timestamp ±infinity sentinels
            return ("b", _I64.pack(0x7FFFFFFFFFFFFFFF))
        if text == "-infinity":
            return ("b", _I64.pack(-0x8000000000000000))
        dt = datetime.fromisoformat(text)
        dt = dt.replace(tzinfo=timezone.utc) if dt.tzinfo is None else dt
        return ("b", _I64.pack(datetime_to_pg_ts(dt)))
    if oid == 1700:
        return ("b", _numeric_to_binary(text))
    if oid == 2950:
        import uuid as _uuid

        return ("b", _uuid.UUID(text).bytes)
    raise ValueError(f"no binary send format implemented for type oid {oid}")


def binary_to_text(oid: int, raw: bytes) -> str:
    """Binary send format → the text spelling the engine's typed-cast
    layer expects (identical to what the same column carries in text
    mode, so binary- and text-mode streams resolve to identical typed
    tables). Used by the loop kernel per cell and by the vectorized
    kernel's rare-type fallback (ints/floats/timestamps/dates/bools are
    converted vectorized in wal.vdecode, never through here)."""
    if oid in BINARY_TEXT_OIDS:
        return raw.decode("utf-8")
    if oid == 3802:
        if not raw or raw[0] != 1:
            raise ValueError("bad jsonb binary version byte")
        return raw[1:].decode("utf-8")
    if oid == 16:
        if len(raw) != 1 or raw[0] not in (0, 1):
            raise ValueError("bad boolean binary cell")
        return "t" if raw[0] else "f"
    if oid in (21, 23, 20, 700, 701, 1082, 1114, 1184):
        # fixed-width cells: validate the width FIRST — struct/np would
        # otherwise raise untyped struct.error on short cells and
        # SILENTLY decode only the leading bytes of oversized ones
        want = {21: 2, 23: 4, 20: 8, 700: 4, 701: 8, 1082: 4,
                1114: 8, 1184: 8}[oid]
        if len(raw) != want:
            raise ValueError(
                f"bad binary cell width for type oid {oid} (corrupt frame)"
            )
    if oid == 21:
        return str(_I16.unpack(raw)[0])
    if oid == 23:
        return str(_I32.unpack(raw)[0])
    if oid == 20:
        return str(_I64.unpack(raw)[0])
    if oid in (700, 701):
        # format through Arrow so the loop kernel's spelling is
        # byte-identical to the vectorized kernel's columnar cast
        # (shortest round-trip; Arrow prints integral floats as '3',
        # Python repr as '3.0' — both CAST equal, but RAW parity matters)
        import math

        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        v = np.frombuffer(raw, dtype=">f4" if oid == 700 else ">f8")
        f = float(v[0])
        if not math.isfinite(f):
            # PG text-mode spellings, not Arrow's 'inf'/'-inf'/'nan' —
            # binary- and text-mode streams must carry identical raw text
            return "NaN" if math.isnan(f) else \
                ("Infinity" if f > 0 else "-Infinity")
        return pc.cast(
            pa.array(v.astype("=f4" if oid == 700 else "=f8")), pa.string()
        )[0].as_py()
    if oid == 1082:
        (days,) = _I32.unpack(raw)
        if days == 0x7FFFFFFF:  # PG date 'infinity' sentinel
            return "infinity"
        if days == -0x80000000:
            return "-infinity"
        return _pg_date_text(days)
    if oid in (1114, 1184):
        (us,) = _I64.unpack(raw)
        if us == 0x7FFFFFFFFFFFFFFF:  # PG timestamp 'infinity' sentinel
            return "infinity"
        if us == -0x8000000000000000:
            return "-infinity"
        try:
            return _pg_ts_text(us)
        except OverflowError:
            # beyond datetime's year range (PG permits to 294276 AD) —
            # render through Arrow exactly like the vectorized kernel
            return _arrow_ts_text(us)
    if oid == 1700:
        return _binary_to_numeric_text(raw)
    if oid == 2950:
        import uuid as _uuid

        return str(_uuid.UUID(bytes=raw))
    raise ValueError(f"no binary receive format implemented for type oid {oid}")
