"""The decode stage: binary WAL frames → typed change events.

Spark-first re-expression of the reference's serial transform pipeline
(reference reader.py:174-331 ``transform_raw``): instead of one Python
generator pulling one message at a time through a pipe, the frame
DataFrame is hash-partitioned by WAL segment, sorted by LSN within
partitions, and decoded by an Arrow-batched kernel. Two kernels share
the RAW output contract:

  - the **vectorized** hot path (``wal.vdecode``, mapInArrow + numpy
    offset tables, ~750k frames/s/core) used for strict decode AND,
    optimistically, for ``strict=False``: each stream-closed group of
    Arrow batches tries the vectorized kernel first and only failing
    groups re-decode through the loop kernel — clean streams never pay
    for quarantine capability. Protocol-v2 streamed transactions decode
    on this path too (offset-math chunk resolution, see wal.vdecode);
  - the **loop** kernel below (struct.unpack per message) — the
    per-message error-isolation unit behind the dead-letter (op='E')
    quarantine path, and the ``vectorized=False`` fallback.

Design for throughput:

  - The Python kernel emits only primitive columns (strings, longs) and
    flat string arrays — no per-row dict/map objects. Name mapping (the
    positional zip of reference reader.py:63-69) happens JVM-side via a
    broadcast join with the tiny registry DataFrame followed by
    ``map_from_arrays``; the TOAST-unchanged column list is computed with
    codegen'd array functions, not Python.
  - The kernel parses with ``struct.unpack_from`` over the raw bytes
    (no BytesIO, no intermediate message objects) and dispatches on the
    first byte (reference decoders.py:58-61 semantics, incl. the Update
    K/O/N state machine and Delete K/O validation).
  - Transaction scoping (reference reader.py:182-193): Begin/Commit
    open/close a transaction whose (xid, begin_lsn, commit_ts) stamps
    every contained event. A segment's frames are contiguous within one
    partition and LSN-sorted, so the kernel carries open-transaction
    state across Arrow batches in a per-segment dict — exact semantics,
    zero extra shuffle (the single segment repartition is also the
    parallelism unit: one decode task per ~segment).

Scale: decode parallelism = number of WAL segments; only I/U/D/T events
are emitted (B/C/R/O/Y are consumed in the kernel; R additionally flows
to the driver-side registry via a JVM byte-predicate filter — see
plans.registry).
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional

from pypgoutput_spark.plans.registry import RelationRegistry, plain_lookup
from pypgoutput_spark.wal import codec

#: kernel output (primitive columns only — see module docstring).
#: ``new_u_masks``: an array of 64-bit mask words, word i>>6 bit i&63 set
#: ⇔ new-tuple cell i is TOAST-unchanged ('u'); a NULL cell with the bit
#: clear is a true NULL ('n'). The bitmask words replace a per-cell
#: category string array — measurably less Arrow transfer and a codegen'd
#: bit test instead of an array index downstream — and the array form
#: covers any relation width (PostgreSQL permits up to 1600 columns;
#: common relations use exactly one word).
RAW_SCHEMA = (
    "lsn BIGINT, op STRING, relation_id INT, xid BIGINT, begin_lsn BIGINT, "
    "commit_ts_us BIGINT, schema_version INT, before_kind STRING, "
    "before_vals ARRAY<STRING>, new_vals ARRAY<STRING>, "
    "new_u_masks ARRAY<BIGINT>, segment BIGINT, error STRING"
)


#: re-exported for API stability — the class itself lives in wal.codec so
#: the vectorized kernel can raise it without a circular import
UnsupportedStreamOp = codec.UnsupportedStreamOp


class StreamState:
    """Protocol-v2 streamed-transaction decode state, carried across
    pandas/Arrow batches within one decode partition.

    ``streams``: (segment, top-level xid) -> [begin_lsn, events,
    dead_letters]. Keyed by xid so CONCURRENT streamed transactions —
    which a real PG14+ walsender interleaves routinely with
    ``streaming = on``; that is the point of the in-chunk xid prefix —
    buffer independently. ``events`` entries carry the message's own
    embedded xid (the SUBTRANSACTION xid per the pgoutput v2 grammar;
    equal to the top-level xid outside savepoints) so a Stream Abort
    with subxid != xid discards only that subtransaction's changes.
    ``dead_letters`` buffers quarantine candidates raised INSIDE a
    stream block: they are emitted only if the stream commits and are
    discarded with an abort — a dead letter for an event that never
    logically existed must not survive.

    ``open_chunk``: segment -> top-level xid of the chunk currently
    open (between 'S' and 'E') in that segment, if any. Chunks never
    nest, so one slot per segment suffices even with many concurrent
    streams.

    ``foreign``: (segment, xid) keys of streams that carried an
    in-chunk Origin message — their events are dropped at seal when
    ``skip_foreign_origins`` filtering is on.
    """

    __slots__ = ("streams", "open_chunk", "foreign")

    def __init__(self):
        self.streams: dict = {}
        self.open_chunk: dict = {}
        self.foreign: set = set()

    def __bool__(self):
        return bool(self.streams) or bool(self.open_chunk)

    def open_xids(self):
        return sorted(x for _, x in self.streams)

# NB: plain functions (not pre-bound Struct methods) — the kernel closure
# must stay cloudpickle-able for shipping to executors
def _unpack_i16(b, pos):
    return struct.unpack_from(">h", b, pos)


def _unpack_i32(b, pos):
    return struct.unpack_from(">i", b, pos)


def _unpack_begin(b, pos):
    return struct.unpack_from(">qqi", b, pos)  # lsn, ts, xid


def _unpack_i64(b, pos):
    return struct.unpack_from(">q", b, pos)


def _parse_tuple(b: bytes, pos: int, oids=None):
    """TupleData at pos → (u_mask_words, vals, end_pos). 'n'/'u' cells →
    None val; word i>>6 bit i&63 of the mask list set ⇔ cell i is
    unchanged-TOAST (reference decoders.py:96-128 grammar; any width).
    'b' cells (PG14+ ``binary = on``) convert to the text-mode spelling
    via the relation's column ``oids`` (from the registry)."""
    (n_cols,) = _unpack_i16(b, pos)
    pos += 2
    words = [0] * ((n_cols + 63) >> 6)
    vals: list = []
    for i in range(n_cols):
        c = b[pos]
        pos += 1
        if c == 116:  # 't'
            (ln,) = _unpack_i32(b, pos)
            pos += 4
            vals.append(b[pos : pos + ln].decode("utf-8"))
            pos += ln
        elif c == 110:  # 'n'
            vals.append(None)
        elif c == 117:  # 'u'
            words[i >> 6] |= 1 << (i & 63)
            vals.append(None)
        elif c == 98:  # 'b' — binary send format
            (ln,) = _unpack_i32(b, pos)
            pos += 4
            if oids is None or i >= len(oids):
                raise ValueError(
                    f"binary TupleData cell at {pos - 5} but the relation's "
                    "column oids are unknown (no Relation message?)"
                )
            vals.append(codec.binary_to_text(oids[i], b[pos : pos + ln]))
            pos += ln
        else:
            raise ValueError(f"bad TupleData category byte {chr(c)!r} at {pos - 1}")
    # two's-complement into signed int64 (Arrow BIGINT): bit 63 set → negative
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    return words, vals, pos


def _loop_decode_pdf(pdf, open_tx: dict, registry_plain: dict, strict: bool,
                     streams: Optional[StreamState] = None,
                     skip_foreign_origins: bool = False,
                     foreign_segs: Optional[set] = None):
    """Per-message loop decode of ONE pandas batch; mutates ``open_tx``
    (segment -> (xid, begin_lsn, commit_ts_us)) and ``streams`` (a
    :class:`StreamState`). Returns a dict of RAW column lists, or None
    when the batch emitted nothing. The per-message try/except is the
    dead-letter (op='E') isolation unit.

    ``skip_foreign_origins``: drop every event of a transaction that
    carries an Origin message 'O' (its rows were replicated FROM another
    node — applying them again loops in an active-active mesh; PG sends
    'O' precisely so subscribers can filter). ``foreign_segs`` is the
    carried-in per-segment foreign flag for a span cut after its 'O'
    (mutated like ``open_tx``). Default False keeps the reference-parity
    skip (events applied, 'O' ignored).

    Protocol v2 (PG14+ ``streaming = on``): a large in-progress
    transaction arrives as chunks ``S(xid) DML... E`` (every in-chunk
    message carries the subtransaction xid after its type byte),
    repeated — chunks of DIFFERENT transactions interleaving freely —
    until a Stream Commit 'c' stamps and releases that xid's buffered
    events or a Stream Abort 'A' discards them (subxid-scoped when the
    abort names a subtransaction) — the decoder's required buffering,
    bounded per segment by the sum of in-flight streamed transactions.
    Streams must COMMIT within the decode partition (segment-aligned
    batching — ``run_ingest(split='segment')`` and the receiver's
    whole-segment files guarantee it); a cut inside an open stream
    raises.
    """
    if streams is None:
        streams = StreamState()
    if foreign_segs is None:
        foreign_segs = set()
    cols = (
        "lsn", "op", "relation_id", "xid", "begin_lsn", "commit_ts_us",
        "schema_version", "before_kind", "before_vals",
        "new_vals", "new_u_masks", "segment", "error",
    )
    out = {k: [] for k in cols}
    a_lsn, a_op, a_rid = out["lsn"].append, out["op"].append, out["relation_id"].append
    a_xid, a_blsn, a_cts = out["xid"].append, out["begin_lsn"].append, out["commit_ts_us"].append
    a_ver, a_bk = out["schema_version"].append, out["before_kind"].append
    a_bv = out["before_vals"].append
    a_nv, a_num = out["new_vals"].append, out["new_u_masks"].append
    a_seg = out["segment"].append
    a_err = out["error"].append

    def emit_dead_letter_row(seg, lsn, err: str):
        """Quarantine row for a corrupt/undecodable frame (op='E'):
        the distributed alternative to the reference's
        tear-down-on-error (reader.py:326-331)."""
        a_lsn(int(lsn)); a_op("E"); a_rid(None)
        a_xid(None); a_blsn(None); a_cts(None)
        a_ver(None); a_bk(None)
        a_bv(None); a_nv(None); a_num(None)
        a_seg(int(seg)); a_err(err)

    def dead_letter(seg, lsn, b: bytes, exc):
        """Route a per-message failure: inside an open stream chunk the
        quarantine row is BUFFERED with the stream (emitted only on
        Stream Commit, discarded on abort — an aborted transaction's
        events never logically existed, so neither did their dead
        letters); outside a chunk it is emitted immediately."""
        err = f"{type(exc).__name__}: {exc}"
        top = streams.open_chunk.get(seg)
        if top is not None:
            # subxid of the failed frame, when its prefix is readable —
            # lets a subxid-scoped abort discard exactly its quarantine
            sub = top
            if len(b) >= 5:
                try:
                    (sub,) = _unpack_i32(b, 1)
                except Exception:  # noqa: BLE001 — keep top-level attribution
                    pass
            streams.streams[(seg, top)][2].append((int(lsn), err, sub))
        else:
            emit_dead_letter_row(seg, lsn, err)

    for seg, lsn, payload in zip(
        pdf["segment"].values, pdf["lsn"].values, pdf["payload"].values
    ):
      try:
        b = bytes(payload)
        t = b[0]
        if t == 66:  # 'B'
            blsn, cts, xid = _unpack_begin(b, 1)
            open_tx[seg] = (xid, int(lsn), cts)
            foreign_segs.discard(seg)
            continue
        if t == 67:  # 'C'
            open_tx.pop(seg, None)
            foreign_segs.discard(seg)
            continue
        if t in (98, 80, 75, 114):  # two-phase 'b'/'P'/'K'/'r'
            if seg in streams.open_chunk:
                raise ValueError(
                    f"two-phase control frame {chr(t)!r} inside a "
                    f"stream chunk at lsn={lsn} (mis-sequenced frame)"
                )
            m = codec.decode_message(b)
            if t == 98:  # 'b' Begin Prepare: opens the span like a 'B'
                open_tx[seg] = (m["xid"], int(lsn), m["prepare_ts_us"])
                foreign_segs.discard(seg)
                mk = ("b", int(lsn), m["prepare_ts_us"])
            elif t == 80:  # 'P' Prepare: seals the span like a 'C'
                tx = open_tx.pop(seg, None)
                if tx is not None and tx[0] != m["xid"]:
                    raise ValueError(
                        f"Prepare for xid={m['xid']} at lsn={lsn} closes a "
                        f"span opened by xid={tx[0]} (mis-sequenced frame)"
                    )
                foreign_segs.discard(seg)
                mk = ("P", None, m["prepare_ts_us"])
            elif t == 75:  # 'K' Commit Prepared (the later decision)
                mk = ("K", None, m["commit_ts_us"])
            else:  # 'r' Rollback Prepared
                mk = ("r", None, m["rollback_ts_us"])
            # marker row: the pipeline plans prepared-transaction staging
            # and resolution from this tiny cohort (gid rides new_vals)
            a_lsn(int(lsn)); a_op(mk[0]); a_rid(None)
            a_xid(m["xid"]); a_blsn(mk[1]); a_cts(mk[2])
            a_ver(None); a_bk(None)
            a_bv(None); a_nv([m["gid"]]); a_num(None)
            a_seg(int(seg)); a_err(None)
            continue
        if t == 83:  # 'S' stream start (v2)
            (sxid,) = _unpack_i32(b, 1)
            first = b[5] != 0
            if seg in streams.open_chunk:
                raise ValueError(
                    f"nested Stream Start at lsn={lsn} (chunk of "
                    f"xid={streams.open_chunk[seg]} still open)"
                )
            if (seg, sxid) in streams.streams:
                pass  # next chunk of the in-flight stream
            elif first:
                streams.streams[(seg, sxid)] = [int(lsn), [], []]
            else:
                raise ValueError(
                    f"stream continuation for unknown xid={sxid} at lsn={lsn}"
                )
            streams.open_chunk[seg] = sxid
            continue
        if t == 69:  # 'E' stream stop (chunk end)
            if seg not in streams.open_chunk:
                raise ValueError(f"Stream Stop outside a stream block at lsn={lsn}")
            del streams.open_chunk[seg]
            continue
        if t == 99:  # 'c' stream commit: stamp + release buffered events
            (sxid,) = _unpack_i32(b, 1)
            st = streams.streams.get((seg, sxid))
            if st is None or seg in streams.open_chunk:
                # validate BEFORE popping: in non-strict mode a corrupt
                # commit must dead-letter alone, not take a genuine
                # open stream's buffered events with it
                raise ValueError(
                    f"Stream Commit for unknown xid={sxid} at lsn={lsn}"
                    if st is None else
                    f"Stream Commit inside an open chunk at lsn={lsn}"
                )
            # parse the WHOLE frame before mutating stream state: a
            # truncated commit must dead-letter alone with the stream
            # still buffered (→ loud partition-end raise), not destroy
            # the committed transaction's events
            (cts,) = _unpack_i64(b, 22)
            del streams.streams[(seg, sxid)]
            if (seg, sxid) in streams.foreign:
                # foreign-origin stream under filtering: the committed
                # events are intentionally NOT applied (loop prevention);
                # quarantine rows still surface (the frames existed)
                streams.foreign.discard((seg, sxid))
                st = [st[0], [], st[2]]
            for e_lsn, e_op, e_rid, e_ver, e_bk, e_bv, e_nv, e_nm, _sub in st[1]:
                a_lsn(e_lsn); a_op(e_op); a_rid(e_rid)
                a_xid(sxid); a_blsn(st[0]); a_cts(cts)
                a_ver(e_ver); a_bk(e_bk)
                a_bv(e_bv); a_nv(e_nv); a_num(e_nm)
                a_seg(int(seg)); a_err(None)
            for dl_lsn, dl_err, _sub in st[2]:
                emit_dead_letter_row(seg, dl_lsn, dl_err)
            continue
        if t == 112:  # 'p' Stream Prepare: seals a streamed txn as
            # PREPARED (the v2 spelling of 'P' — PG15 streaming=on +
            # two_phase=on). The buffered events are released stamped
            # with (xid, first-S lsn, prepare ts) exactly like a plain
            # b..P span's body; their FATE — merge or vanish — is the
            # pipeline's call when the K/r decision arrives, planned
            # from the 'p' marker row below (gid rides new_vals).
            m = codec.decode_message(b)
            sxid = m["xid"]
            st = streams.streams.get((seg, sxid))
            if st is None or seg in streams.open_chunk:
                # validate BEFORE popping (Stream Commit policy)
                raise ValueError(
                    f"Stream Prepare for unknown xid={sxid} at lsn={lsn}"
                    if st is None else
                    f"Stream Prepare inside an open chunk at lsn={lsn}"
                )
            pts = m["prepare_ts_us"]
            del streams.streams[(seg, sxid)]
            if (seg, sxid) in streams.foreign:
                streams.foreign.discard((seg, sxid))
                st = [st[0], [], st[2]]
            for e_lsn, e_op, e_rid, e_ver, e_bk, e_bv, e_nv, e_nm, _sub in st[1]:
                a_lsn(e_lsn); a_op(e_op); a_rid(e_rid)
                a_xid(sxid); a_blsn(st[0]); a_cts(pts)
                a_ver(e_ver); a_bk(e_bk)
                a_bv(e_bv); a_nv(e_nv); a_num(e_nm)
                a_seg(int(seg)); a_err(None)
            # dead-letter candidates surface with the prepare (plain
            # b..P parity: a corrupt FRAME inside a prepared span is
            # recorded even if the transaction later rolls back — the
            # frame physically existed; only an ABORTED stream's events
            # never logically happened)
            for dl_lsn, dl_err, _sub in st[2]:
                emit_dead_letter_row(seg, dl_lsn, dl_err)
            a_lsn(int(lsn)); a_op("p"); a_rid(None)
            a_xid(sxid); a_blsn(None); a_cts(pts)
            a_ver(None); a_bk(None)
            a_bv(None); a_nv([m["gid"]]); a_num(None)
            a_seg(int(seg)); a_err(None)
            continue
        if t == 65:  # 'A' stream abort: discard buffered events
            (sxid,) = _unpack_i32(b, 1)
            (sub,) = _unpack_i32(b, 5)
            st = streams.streams.get((seg, sxid))
            if st is None or seg in streams.open_chunk:  # validate before popping
                raise ValueError(
                    f"Stream Abort for unknown xid={sxid} at lsn={lsn}"
                    if st is None else
                    f"Stream Abort inside an open chunk at lsn={lsn}"
                )
            if sub == sxid:
                del streams.streams[(seg, sxid)]  # whole-transaction abort
                streams.foreign.discard((seg, sxid))
            else:
                # subtransaction abort (pgoutput v2: only the named
                # subxid's changes roll back — the reason in-chunk
                # messages carry their SUBtransaction's xid): keep the
                # stream, drop that subxid's buffered events and their
                # dead-letter candidates
                st[1] = [e for e in st[1] if e[8] != sub]
                st[2] = [d for d in st[2] if d[2] != sub]
            continue

        top_xid = streams.open_chunk.get(seg)
        in_stream = top_xid is not None
        sub_xid = None
        if in_stream:
            (sub_xid,) = _unpack_i32(b, 1)
            if sub_xid != top_xid and (seg, sub_xid) in streams.streams:
                # a foreign chunk's message mis-sequenced into this block
                # would otherwise be silently committed with the WRONG
                # transaction; a subxid can never collide with another
                # in-flight top-level xid (PG xids are unique)
                raise ValueError(
                    f"in-chunk message carries xid={sub_xid} inside the "
                    f"chunk of xid={top_xid} at lsn={lsn}, but xid="
                    f"{sub_xid} is a different open stream (mis-sequenced"
                    " chunk)"
                )
            b = b[0:1] + b[5:]  # strip the in-chunk xid → v1 payload

        if t in (82, 79, 89):  # 'R' (driver-side), 'O', 'Y' (reference stubs)
            if t == 79 and skip_foreign_origins:
                # Origin: this transaction's rows came FROM another node
                # — mark its events for the drop (v1 span or v2 stream)
                if in_stream:
                    streams.foreign.add((seg, top_xid))
                else:
                    foreign_segs.add(seg)
            continue

        if t == 77:  # 'M' logical decoding message (pg_logical_emit_message)
            if len(b) < 15:
                raise ValueError(
                    f"truncated pgoutput 'M' message ({len(b)} bytes; "
                    "corrupt frame)"
                )
            flags = b[1]
            nul = b.find(0, 10)
            if nul < 0 or nul + 5 > len(b):
                raise ValueError(
                    "Message prefix/length overruns the frame (corrupt frame)"
                )
            prefix = b[10:nul].decode("utf-8")
            (clen,) = _unpack_i32(b, nul + 1)
            if clen < 0 or nul + 5 + clen > len(b):
                raise ValueError(
                    f"Message content overruns the frame (len={clen}, "
                    f"{len(b)} bytes; corrupt frame)"
                )
            # the engine surfaces content as text (the outbox pattern
            # carries JSON); undecodable bytes raise → dead-letter in
            # non-strict mode rather than a silently corrupt string
            content = b[nul + 5 : nul + 5 + clen].decode("utf-8")
            transactional = flags & 1 == 1
            bk = "t" if transactional else "n"
            vals = [prefix, content]
            if in_stream:
                # in-chunk messages follow their chunk's transaction fate
                # (PG only places transactional messages inside chunks)
                streams.streams[(seg, top_xid)][1].append(
                    (int(lsn), "M", None, None, bk, None, vals, None, sub_xid)
                )
                continue
            if transactional and seg in foreign_segs:
                continue  # follows its foreign transaction's skip
            tx = open_tx.get(seg) if transactional else None
            a_lsn(int(lsn)); a_op("M"); a_rid(None)
            a_xid(tx[0] if tx else None)
            a_blsn(tx[1] if tx else None)
            a_cts(tx[2] if tx else None)
            a_ver(None); a_bk(bk)
            a_bv(None); a_nv(vals); a_num(None)
            a_seg(int(seg)); a_err(None)
            continue

        if t == 84:  # 'T' truncate: fan out per relation (reader.py:307-320)
            if in_stream:
                # the pipeline's truncate barrier is planned driver-side
                # from frame METADATA before decode; a truncate whose
                # commit/abort is only known at stream end cannot honor
                # that contract — refuse loudly (quarantining it would
                # silently corrupt the table)
                raise UnsupportedStreamOp(
                    f"Truncate inside a streamed transaction at lsn={lsn} "
                    "is not supported"
                )
            if len(b) < 6:
                # typed error BEFORE the unpack: a <5-byte T would
                # otherwise escape strict mode as raw struct.error
                raise ValueError(
                    f"truncated pgoutput 'T' message ({len(b)} bytes; "
                    "corrupt frame)"
                )
            (n_rel,) = _unpack_i32(b, 1)
            if n_rel < 0 or 6 + 4 * n_rel > len(b):
                # typed error (not struct.error) for a flipped n_rel byte
                raise ValueError(
                    f"Truncate relation list overruns the frame "
                    f"(n_rel={n_rel}, {len(b)} bytes; corrupt frame)"
                )
            if seg in foreign_segs:
                raise UnsupportedStreamOp(
                    f"Truncate at lsn={lsn} inside a foreign-origin "
                    "transaction is not supported with "
                    "skip_foreign_origins (the truncate barrier is "
                    "planned from frame metadata, which carries no "
                    "origin)"
                )
            tx = open_tx.get(seg)
            for k in range(n_rel):
                (rid,) = _unpack_i32(b, 6 + 4 * k)
                looked = plain_lookup(registry_plain, rid, int(lsn))
                ver = looked[0] if looked else None
                a_lsn(int(lsn)); a_op("T"); a_rid(rid)
                a_xid(tx[0] if tx else None)
                a_blsn(tx[1] if tx else None)
                a_cts(tx[2] if tx else None)
                a_ver(ver)
                a_bk(None); a_bv(None); a_nv(None); a_num(None)
                a_seg(int(seg)); a_err(None)
            continue

        (rid,) = _unpack_i32(b, 1)
        looked = plain_lookup(registry_plain, rid, int(lsn))
        if looked is None:
            if strict:
                raise ValueError(
                    f"no Relation message seen for relation_id={rid} at "
                    f"lsn={lsn} (stream must carry 'R' before DML)"
                )
            continue
        version = looked[0]
        oids = looked[3]
        bk = None
        b_vals = n_vals = n_mask = None

        if t == 73:  # 'I'
            if b[5] != 78:  # 'N'
                raise ValueError("Insert expects 'N' tuple marker")
            n_mask, n_vals, _ = _parse_tuple(b, 6, oids)
            op = "I"
        elif t == 85:  # 'U' — K/O optional old image, then mandatory N
            pos = 5
            marker = b[pos]
            pos += 1
            if marker in (75, 79):  # 'K' / 'O'
                bk = chr(marker)
                _b_mask, b_vals, pos = _parse_tuple(b, pos, oids)
                marker = b[pos]
                pos += 1
            if marker != 78:
                raise ValueError(
                    f"Update missing 'N' new-tuple marker, got {chr(marker)!r}"
                )
            n_mask, n_vals, _ = _parse_tuple(b, pos, oids)
            op = "U"
        elif t == 68:  # 'D' — K or O required
            marker = b[5]
            if marker not in (75, 79):
                raise ValueError(
                    f"Delete tuple kind must be 'K' or 'O', got {chr(marker)!r}"
                )
            bk = chr(marker)
            _b_mask, b_vals, _ = _parse_tuple(b, 6, oids)
            op = "D"
        else:
            raise ValueError(f"unknown pgoutput message type byte {chr(t)!r}")

        if in_stream:
            # uncommitted: buffer (with the message's subxid) until the
            # stream's 'c' stamps it or an 'A' discards it
            streams.streams[(seg, top_xid)][1].append(
                (int(lsn), op, rid, version, bk, b_vals, n_vals, n_mask, sub_xid)
            )
            continue
        if seg in foreign_segs:
            continue  # foreign-origin transaction under filtering
        tx = open_tx.get(seg)
        a_lsn(int(lsn)); a_op(op); a_rid(rid)
        a_xid(tx[0] if tx else None)
        a_blsn(tx[1] if tx else None)
        a_cts(tx[2] if tx else None)
        a_ver(version); a_bk(bk)
        a_bv(b_vals); a_nv(n_vals); a_num(n_mask)
        a_seg(int(seg)); a_err(None)
      except Exception as exc:  # noqa: BLE001
        if strict or isinstance(exc, UnsupportedStreamOp):
            raise
        dead_letter(seg, lsn, bytes(payload), exc)

    return out if out["lsn"] else None


def _make_kernel(registry_plain: dict, strict: bool = True,
                 init_tx: Optional[dict] = None,
                 skip_foreign_origins: bool = False,
                 init_foreign: Optional[set] = None):
    """mapInPandas loop kernel. ``init_tx``: open-transaction state
    carried in from a previous micro-batch whose cut fell inside a
    transaction (B seen, no C yet) — the distributed analog of the
    reference's in-memory ``transaction_metadata`` surviving arbitrary
    message boundaries (reference reader.py:182-193). Keyed by segment."""

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        open_tx: dict = dict(init_tx) if init_tx else {}
        foreign_segs: set = set(init_foreign) if init_foreign else set()
        streams = StreamState()
        for pdf in batches:
            out = _loop_decode_pdf(
                pdf, open_tx, registry_plain, strict, streams,
                skip_foreign_origins=skip_foreign_origins,
                foreign_segs=foreign_segs,
            )
            if out:  # empty pandas frames break Arrow type inference
                yield pd.DataFrame(out)
        if streams:
            raise ValueError(
                f"streamed transaction(s) still open at partition end "
                f"(xids {streams.open_xids()}): cut batches on "
                "segment boundaries (split='segment' / whole-segment files)"
            )

    return kernel


def _make_optimistic_kernel(registry_plain: dict, init_tx: Optional[dict] = None,
                            forbid_loop: bool = False,
                            skip_foreign_origins: bool = False,
                            init_foreign: Optional[set] = None,
                            stream_spill_bytes: Optional[int] = None,
                            spill_dir: Optional[str] = None):
    """strict=False HOT path: decode each stream-closed group of Arrow
    batches with the vectorized kernel (protocol-v2 streams included —
    ``vdecode._group_stream_batches`` coalesces batches until every
    stream opened in them closes, passing pure-v1 batches through
    one-to-one) and fall back to the per-message loop kernel (dead-letter
    op='E' isolation) only for groups that fail — clean streams pay
    nothing for quarantine capability. Open-transaction carry stays
    exact: the vectorized attempt runs on a COPY of the carry state that
    is committed only on success; a failed group re-decodes from the
    pre-group state through the loop kernel, which updates it directly.

    ``forbid_loop=True`` (captured at plan time) turns any loop-kernel
    fallback into a hard failure — the test pin proving the vectorized
    path carries a given workload end-to-end.

    ``stream_spill_bytes``: bounded-memory mode for OVERSIZED streamed
    transactions (wal.vspill). Under-threshold groups keep the full
    optimistic behavior above (vectorized, loop fallback, dead-letter
    quarantine); a group that overflows the threshold spools to disk and
    decodes STRICTLY — per-message quarantine isolation requires
    buffering the group, which is exactly what the spill exists to
    avoid, so a grammar error inside an oversized streamed transaction
    fails the batch loudly (PostgreSQL's apply worker errors out there
    too) instead of dead-lettering."""
    import pyarrow as pa

    from pypgoutput_spark.wal import vdecode

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pandas as pd

        open_tx: dict = dict(init_tx) if init_tx else {}
        foreign_segs: set = set(init_foreign) if init_foreign else set()
        streams = StreamState()
        if stream_spill_bytes is not None:
            from pypgoutput_spark.wal import vspill

            grouper = vspill.group_stream_batches_spill(
                batches, stream_spill_bytes,
                skip_foreign_origins=skip_foreign_origins,
                spill_dir=spill_dir,
            )
        else:
            vspill = None
            grouper = vdecode._group_stream_batches(batches)
        for group in grouper:
            if vspill is not None and isinstance(group, vspill.SpilledGroup):
                if streams:
                    raise ValueError(
                        "spilled stream group reached while the loop "
                        "kernel holds open stream state (xids "
                        f"{streams.open_xids()}) — quarantined stream "
                        "control frames left the carry undrained"
                    )
                yield from vspill.decode_spilled_group(
                    group, open_tx, registry_plain,
                    skip_foreign_origins=skip_foreign_origins,
                    foreign_segs=foreign_segs,
                )
                continue
            # once a fallback leaves loop-kernel stream state open, the
            # loop kernel must keep control until that state drains —
            # the vectorized kernel cannot adopt half-buffered streams
            if not streams:
                tx_try = dict(open_tx)
                fg_try = set(foreign_segs)
                try:
                    outs = list(
                        vdecode.process_batch(
                            vdecode._combine(group), tx_try, registry_plain,
                            skip_foreign_origins=skip_foreign_origins,
                            foreign_segs=fg_try,
                        )
                    )
                except UnsupportedStreamOp:
                    raise  # never quarantinable — fail the batch loudly
                except Exception:  # noqa: BLE001 — isolate per message below
                    pass
                else:
                    open_tx.clear()
                    open_tx.update(tx_try)
                    foreign_segs.clear()
                    foreign_segs.update(fg_try)
                    yield from outs
                    continue
            if forbid_loop:
                raise AssertionError(
                    "loop-kernel fallback engaged with forbid_loop=True"
                )
            for rb in group:
                out = _loop_decode_pdf(
                    rb.to_pandas(), open_tx, registry_plain, strict=False,
                    streams=streams,
                    skip_foreign_origins=skip_foreign_origins,
                    foreign_segs=foreign_segs,
                )
                if out:
                    yield pa.RecordBatch.from_pandas(
                        pd.DataFrame(out), schema=vdecode.RAW_PA_SCHEMA,
                        preserve_index=False,
                    )
        if streams:
            raise ValueError(
                f"streamed transaction(s) still open at partition end "
                f"(xids {streams.open_xids()}): cut batches on "
                "segment boundaries (split='segment' / whole-segment files)"
            )

    return kernel


def decode_frames_raw(frames_df, registry: Optional[RelationRegistry] = None,
                      strict: bool = True, clustered: bool = False,
                      open_tx: Optional[dict] = None,
                      vectorized: Optional[bool] = None,
                      forbid_loop: bool = False,
                      skip_foreign_origins: bool = False,
                      open_foreign: Optional[set] = None,
                      stream_spill_bytes: Optional[int] = None):
    """frames → RAW decoded events (positional cell arrays, no maps).

    The hot-path form; use :func:`project_relation` for typed columns of
    one relation, or :func:`decode_frames` for the generic named-map form.

    ``clustered=True`` declares that every WAL segment is wholly contained
    in one input partition (true for a receiver that lands frames in LSN
    order with segment-aligned files, and for the synthetic generator) —
    decode then runs with only a cheap *local* sort, *zero shuffle*, and
    parallelism = input partitions. Default is a repartition by segment
    for arbitrary frame layouts. Transaction stamping is exact either way
    (the kernel keys open-transaction state by segment).

    ``forbid_loop`` (strict=False only; captured at plan time): turn any
    loop-kernel fallback into a hard failure — the test pin proving a
    workload decodes wholly on the vectorized path.

    ``skip_foreign_origins``: drop every event of a transaction carrying
    an Origin message 'O' — client-side loop prevention for active-active
    replication meshes (the reference stubs 'O'; default False keeps that
    parity). ``open_foreign``: segments whose carried-in open transaction
    already saw its 'O' in a previous micro-batch (carried like
    ``open_tx``).

    ``stream_spill_bytes`` (vectorized paths, strict or not): bounded-
    memory decode of OVERSIZED streamed transactions — a stream group
    whose buffered Arrow bytes exceed the threshold spools to a local
    disk file and decodes via a two-pass fate map (wal.vspill,
    PostgreSQL's apply-worker spill analog) instead of pinning the
    transaction's whole byte range in executor memory. Identical output
    either way. Under strict=False, under-threshold groups keep full
    dead-letter quarantine; an OVERFLOWING group decodes strictly (see
    ``_make_optimistic_kernel``). Ignored by the vectorized=False loop
    kernel, which buffers per message, not per group.
    """
    if registry is None:
        registry = RelationRegistry.from_frames(frames_df)
    plain = registry.to_plain()
    if clustered:
        partitioned = frames_df.sortWithinPartitions("segment", "lsn")
    else:
        partitioned = frames_df.repartition("segment").sortWithinPartitions("segment", "lsn")
    # the Arrow-native numpy kernel (wal.vdecode) is the hot path for BOTH
    # modes: strict maps it directly; strict=False runs it optimistically
    # per Arrow batch and falls back to the per-message loop kernel (the
    # dead-letter op='E' isolation unit) only for batches that fail, so
    # quarantine capability costs nothing on clean streams.
    # ``vectorized=False`` forces the loop kernel everywhere.
    if vectorized is None:
        vectorized = True
    if vectorized and strict:
        from pypgoutput_spark.wal import vdecode

        return partitioned.mapInArrow(
            vdecode.make_kernel(
                plain, init_tx=open_tx,
                skip_foreign_origins=skip_foreign_origins,
                init_foreign=open_foreign,
                stream_spill_bytes=stream_spill_bytes,
            ),
            schema=RAW_SCHEMA,
        )
    if vectorized:
        return partitioned.mapInArrow(
            _make_optimistic_kernel(
                plain, init_tx=open_tx, forbid_loop=forbid_loop,
                skip_foreign_origins=skip_foreign_origins,
                init_foreign=open_foreign,
                stream_spill_bytes=stream_spill_bytes,
            ),
            schema=RAW_SCHEMA,
        )
    return partitioned.mapInPandas(
        _make_kernel(
            plain, strict, init_tx=open_tx,
            skip_foreign_origins=skip_foreign_origins,
            init_foreign=open_foreign,
        ),
        schema=RAW_SCHEMA,
    )


def project_relation(raw_events, relation_version, typed: bool = False,
                     json_as_variant: bool = False, with_old_keys: bool = False):
    """Positional projection of RAW events for one relation version →
    plain typed columns (reference reader.py:63-69, vectorized, JVM-side):

        lsn, op, xid, begin_lsn, commit_ts_us, <key+value columns as
        STRING>, u_<col> BOOLEAN (TOAST-unchanged flags)

    Delete events take key columns from the before-image (replica
    identity); I/U take everything from the new tuple. No maps, no
    Python — the whole projection is codegen'd array indexing, and the
    downstream LWW shuffle carries flat strings instead of map objects.

    ``json_as_variant`` (with ``typed``): json/jsonb columns (OIDs
    114/3802) parse to Spark VARIANT instead of staying text — the
    analog of the reference's pydantic.Json → dict parsing
    (reader.py:93-94, asserted at tests/test_reader.py:203,223);
    malformed json becomes NULL (try_parse_json), matching the
    dead-letter philosophy rather than tearing the stream down.
    """
    from pyspark.sql import functions as F

    JSON_OIDS = (114, 3802)
    rv = relation_version
    cols = [F.col("lsn"), F.col("op"), F.col("xid"), F.col("begin_lsn"),
            F.col("commit_ts_us")]
    key_set = set(rv.key_columns)
    spark_types = dict(rv.spark_fields()) if typed else {}
    oids = {c[1]: c[2] for c in rv.columns}
    for i, name in enumerate(rv.column_names):
        new_v = F.col("new_vals").getItem(i)
        if name in key_set:
            c = (
                F.when(F.col("op") == "D", F.col("before_vals").getItem(i))
                .otherwise(new_v)
            )
        else:
            c = new_v
        if typed:
            # typed validation/cast, the pydantic-model analog
            # (reference reader.py:87-98, 260-296): pgoutput wire values
            # are always text; typing applies post-decode per the OID map
            if json_as_variant and oids.get(name) in JSON_OIDS:
                c = F.try_parse_json(c)
            else:
                c = c.cast(spark_types[name])
        cols.append(c.alias(name))
        # TOAST-unchanged flag: one codegen'd bit test on the u-mask word
        # (arithmetic shift preserves bit k of two's-complement words)
        cols.append(
            (F.coalesce(
                F.shiftright(
                    F.element_at(F.col("new_u_masks"), i // 64 + 1), i % 64
                ).bitwiseAND(F.lit(1)),
                F.lit(0),
            ) == 1).alias(f"u_{name}")
        )
        if with_old_keys and name in key_set:
            # the before-image key for U events (pgoutput sends a 'K'/'O'
            # old image when key columns changed — reference
            # tests/test_reader.py:231-251): lets the pipeline replay a
            # key-change update as DELETE(old key) + upsert(new key)
            cols.append(
                F.when(F.col("op") == "U", F.col("before_vals").getItem(i))
                .alias(f"__old_{name}")
            )
    return (
        raw_events.filter(
            (F.col("relation_id") == rv.relation_id)
            & (F.col("schema_version") == rv.version)
        ).select(*cols)
    )


def project_relation_typed(raw_events, relation_version, table=None,
                           json_as_variant=None, with_old_keys: bool = False):
    """Typed projection honoring LakeTable properties: ``json_as_variant``
    defaults to the table's ``props["json_as_variant"]`` and, absent a
    table/prop, to True — the reference parses json columns by default
    (reference reader.py:93-94, asserted tests/test_reader.py:203,223).
    Pass ``json_as_variant=False`` (or set the table prop) to keep
    json/jsonb as wire text."""
    if json_as_variant is None:
        props = table.snapshot().get("props", {}) if table is not None else {}
        json_as_variant = bool(props.get("json_as_variant", True))
    return project_relation(
        raw_events, relation_version, typed=True,
        json_as_variant=json_as_variant, with_old_keys=with_old_keys,
    )


def decode_frames(frames_df, registry: Optional[RelationRegistry] = None,
                  strict: bool = True, open_tx: Optional[dict] = None,
                  stream_spill_bytes: Optional[int] = None):
    """frames (segment, lsn, payload) → canonical change events.

    One shuffle (repartition by segment for transaction co-location);
    name mapping and TOAST bookkeeping are JVM-side (broadcast registry
    join + map_from_arrays + codegen'd array ops).

    Output: lsn, op, relation_id, xid, begin_lsn, commit_ts(_us),
    schema_version, before_kind, before/after MAP<STRING,STRING>,
    after_unchanged ARRAY<STRING>, segment.
    """
    from pyspark.sql import functions as F

    spark = frames_df.sparkSession
    if registry is None:
        registry = RelationRegistry.from_frames(frames_df)

    reg_rows = [
        (rid, v.version, list(v.column_names))
        for rid in registry.relation_ids()
        for v in registry.versions(rid)
    ]
    reg_df = spark.createDataFrame(
        reg_rows or [(0, 0, [])],
        schema="relation_id INT, schema_version INT, col_names ARRAY<STRING>",
    )

    raw = decode_frames_raw(frames_df, registry, strict, open_tx=open_tx,
                            stream_spill_bytes=stream_spill_bytes)
    return (
        raw.join(F.broadcast(reg_df), ["relation_id", "schema_version"], "left")
        .withColumn(
            "before",
            F.when(
                F.col("before_vals").isNotNull(),
                F.map_from_arrays(F.col("col_names"), F.col("before_vals")),
            ),
        )
        .withColumn(
            "after",
            F.when(
                F.col("new_vals").isNotNull(),
                F.map_from_arrays(F.col("col_names"), F.col("new_vals")),
            ),
        )
        .withColumn(
            "after_unchanged",
            F.when(
                F.col("new_vals").isNotNull(),
                F.expr(
                    "transform(filter(sequence(0, size(col_names) - 1), "
                    "i -> ((shiftright(element_at(new_u_masks, "
                    "CAST(i DIV 64 AS INT) + 1), CAST(i % 64 AS INT)) & 1) = 1)), "
                    "i -> col_names[i])"
                ),
            ),
        )
        .withColumn(
            "commit_ts",
            F.timestamp_micros(F.col("commit_ts_us") + F.lit(codec.PG_EPOCH_UNIX_US)),
        )
        .drop("before_vals", "new_vals", "new_u_masks", "col_names")
    )
