"""Streaming-replication WIRE protocol over a real socket.

The file-spool seam (``sources.receiver``) proves the landing/ack/restart
mechanics; this module closes the remaining gap to the reference's
``consume_stream`` loop (reference reader.py:334-390) by speaking the
actual byte layout of PostgreSQL's streaming-replication COPY-both
sub-protocol (public wire docs, "Streaming Replication Protocol") over a
TCP socket:

  server → client, each wrapped in an outer CopyData ('d') frame:
    XLogData    'w' Int64 dataStart(LSN) Int64 walEnd Int64 sendTime(µs,
                PG epoch) + the pgoutput message bytes
    Keepalive   'k' Int64 walEnd Int64 sendTime Byte1 replyRequested
  client → server (CopyData-wrapped):
    StatusUpdate 'r' Int64 written+1 Int64 flushed+1 Int64 applied+1
                Int64 clientTime Byte1 replyRequested
                (the reference's ``send_feedback(flush_lsn)``)
  stream end: CopyDone ('c').

The receiver gets NO segment or mtype metadata — exactly like a real
walsender client — and reconstructs both at capture time:

  - **mtype stamping**: first payload byte, lowercased for messages
    inside a protocol-v2 stream chunk (S..E state tracked from the
    stream itself) — producing the stamped-frames contract the engine's
    metadata-only driver paths rely on (wal.generator FRAMES_SCHEMA
    note: "the receiver knows stream state at capture").
  - **segment rolling**: receiver-assigned monotone segment ids, cut
    only at SAFE boundaries (no open B..C transaction, no open v2
    stream) once a target frame count is reached — the property decode
    and the streamed-transaction contract require (a transaction or
    stream never spans segments).
  - **flush-LSN feedback**: a StatusUpdate after every landed segment
    file, and an immediate one for any keepalive with replyRequested —
    the ack a real primary uses to advance the slot's restart LSN.

The FE/BE session phase is spoken too (r5): StartupMessage with
``replication=database`` → AuthenticationOk → ParameterStatus →
ReadyForQuery → START_REPLICATION (slot, LOGICAL, proto_version +
publication_names) → CopyBothResponse — the byte sequence psycopg2's
LogicalReplicationConnection performs in the reference; plain-session
or unsupported-proto clients draw an ErrorResponse like a real
walsender. What the sandbox still cannot provide is only the live
PostgreSQL server itself.
"""

from __future__ import annotations

import os
import socket
import struct
import threading
import time
from typing import Iterable, List, Optional, Tuple

_I32 = struct.Struct(">i")
_XLOG_HDR = struct.Struct(">qqq")       # dataStart, walEnd, sendTime
_KEEPALIVE = struct.Struct(">qqB")      # walEnd, sendTime, replyRequested
_STATUS = struct.Struct(">qqqqB")       # written+1, flushed+1, applied+1, time, reply

#: µs between unix and PG epochs (2000-01-01), mirrors wal.codec
_PG_EPOCH_US = 946_684_800_000_000


def _copy_data(body: bytes) -> bytes:
    """Outer CopyData frame: 'd', Int32 length (self-inclusive), body."""
    return b"d" + _I32.pack(4 + len(body)) + body


def _copy_done() -> bytes:
    return b"c" + _I32.pack(4)


def _now_pg_us() -> int:
    return int(time.time() * 1_000_000) - _PG_EPOCH_US


class _SockReader:
    """Exact-count buffered reads over a socket."""

    def __init__(self, sock: socket.socket):
        self.sock = sock
        self.buf = b""

    def read(self, n: int) -> bytes:
        while len(self.buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("replication socket closed mid-message")
            self.buf += chunk
        out, self.buf = self.buf[:n], self.buf[n:]
        return out


class WalSocketServer:
    """The walsender half of the seam: streams (lsn, payload) frames as
    XLogData over one accepted connection, interleaving keepalives
    (``keepalive_every`` frames, replyRequested set), and consumes the
    client's StatusUpdate feedback on a reader thread. After the last
    frame it sends CopyDone and drains feedback until the client closes.

    ``flush_history`` records every flushed-LSN the client reported (the
    raw value, i.e. the wire's flushed+1 minus 1) — tests assert
    monotonicity and completion against it.
    """

    def __init__(self, frames: Iterable[Tuple[int, bytes]],
                 keepalive_every: int = 500):
        self.frames = list(frames)
        self.keepalive_every = keepalive_every
        self.flush_history: List[int] = []
        #: FE/BE handshake artifacts, recorded for test assertions
        self.startup_params: dict = {}
        self.start_replication_query: Optional[str] = None
        self.srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.srv.bind(("127.0.0.1", 0))
        self.srv.listen(1)
        self.addr = self.srv.getsockname()
        self._thread: Optional[threading.Thread] = None
        self.error: Optional[BaseException] = None

    def _feedback_loop(self, rd: _SockReader, stop: threading.Event) -> None:
        try:
            while not stop.is_set():
                t = rd.read(1)
                if t != b"d":
                    return
                (ln,) = _I32.unpack(rd.read(4))
                body = rd.read(ln - 4)
                if body[0:1] == b"r":
                    _w, flushed, _a, _t, _reply = _STATUS.unpack_from(body, 1)
                    self.flush_history.append(flushed - 1)
        except (ConnectionError, OSError):
            return

    def _handshake(self, conn, rd: _SockReader) -> None:
        """FE/BE startup + replication-command phase (public protocol,
        "Message Formats" + "Streaming Replication Protocol"): consume
        the StartupMessage (protocol 3.0; ``replication=database``
        required — a plain-session client gets an ErrorResponse exactly
        like a real walsender), answer AuthenticationOk →
        ParameterStatus → ReadyForQuery, then accept one
        START_REPLICATION simple query (proto_version 1 or 2) and enter
        COPY-both with CopyBothResponse."""
        (ln,) = _I32.unpack(rd.read(4))
        body = rd.read(ln - 4)
        (proto,) = _I32.unpack_from(body, 0)
        if proto != 196608:  # protocol 3.0
            raise ValueError(f"unsupported FE protocol {proto}")
        parts = body[4:].split(b"\x00")
        self.startup_params = {
            parts[i].decode(): parts[i + 1].decode()
            for i in range(0, len(parts) - 1, 2) if parts[i]
        }
        if self.startup_params.get("replication") != "database":
            err = (b"SFATAL\x00C08P01\x00Mlogical replication requires "
                   b"replication=database\x00\x00")
            conn.sendall(b"E" + _I32.pack(4 + len(err)) + err)
            raise ValueError("client did not request a replication session")
        out = bytearray(b"R" + _I32.pack(8) + _I32.pack(0))  # AuthenticationOk
        for k, v in (("server_version", "16.0"), ("integer_datetimes", "on")):
            pbody = k.encode() + b"\x00" + v.encode() + b"\x00"
            out += b"S" + _I32.pack(4 + len(pbody)) + pbody
        out += b"Z" + _I32.pack(5) + b"I"  # ReadyForQuery (idle)
        conn.sendall(bytes(out))
        t = rd.read(1)
        if t != b"Q":
            raise ValueError(f"expected simple Query, got {t!r}")
        (qln,) = _I32.unpack(rd.read(4))
        q = rd.read(qln - 4).rstrip(b"\x00").decode()
        self.start_replication_query = q
        if not q.upper().startswith("START_REPLICATION"):
            raise ValueError(f"expected START_REPLICATION, got {q[:40]!r}")
        if "proto_version" in q and not (
            "proto_version '1'" in q or "proto_version '2'" in q
        ):
            err = b"SERROR\x00C0A000\x00Munsupported proto_version\x00\x00"
            conn.sendall(b"E" + _I32.pack(4 + len(err)) + err)
            raise ValueError(f"unsupported proto_version in {q!r}")
        # CopyBothResponse: overall format 0 (text), zero columns
        conn.sendall(b"W" + _I32.pack(7) + b"\x00" + struct.pack(">h", 0))

    def _serve(self) -> None:
        try:
            conn, _ = self.srv.accept()
            rd = _SockReader(conn)
            self._handshake(conn, rd)
            stop = threading.Event()
            fb = threading.Thread(
                target=self._feedback_loop, args=(rd, stop), daemon=True
            )
            fb.start()
            sent = 0
            out = bytearray()
            for lsn, payload in self.frames:
                out += _copy_data(
                    b"w" + _XLOG_HDR.pack(lsn, lsn, _now_pg_us()) + payload
                )
                sent += 1
                if sent % self.keepalive_every == 0:
                    out += _copy_data(
                        b"k" + _KEEPALIVE.pack(lsn, _now_pg_us(), 1)
                    )
                if len(out) >= 1 << 18:
                    conn.sendall(bytes(out))
                    out.clear()
            out += _copy_done()
            conn.sendall(bytes(out))
            # drain feedback until the client closes (final flush ack)
            fb.join(timeout=30)
            stop.set()
            conn.close()
        except BaseException as exc:  # noqa: BLE001 — surfaced to the test
            self.error = exc
        finally:
            self.srv.close()

    def start(self) -> "WalSocketServer":
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()
        return self

    def join(self, timeout: float = 60) -> None:
        assert self._thread is not None
        self._thread.join(timeout)
        if self.error:
            raise self.error


class SocketWalReceiver:
    """The ``consume_stream`` analog over the wire: connects, parses
    XLogData, stamps mtypes (capture-time stream state), rolls
    receiver-assigned segments at safe transaction boundaries, lands
    each segment as one parquet frame file (atomic rename, dot-prefixed
    staging), and acks the flush LSN with a StatusUpdate after every
    landed file — plus an immediate ack for any keepalive that requests
    a reply."""

    def __init__(self, addr, frames_dir: str, segment_frames: int = 1000,
                 slot: str = "pypgoutput_spark", publication: str = "pub",
                 proto_version: int = 1):
        self.addr = addr
        self.frames_dir = frames_dir
        self.segment_frames = segment_frames
        self.slot, self.publication = slot, publication
        self.proto_version = proto_version
        #: ParameterStatus values the server reported during startup
        self.server_params: dict = {}
        os.makedirs(frames_dir, exist_ok=True)
        self.flush_lsn = -1
        self.next_seg = 0
        self._buf: List[tuple] = []
        # capture-time protocol state
        self._chunk_open = False       # inside S..E
        self._open_streams: set = set()  # first-S'd, un-committed/aborted xids
        self._txn_open = False         # inside B..C
        self.segments_landed = 0

    # ---- safe-boundary tracking ------------------------------------

    def _observe(self, payload: bytes) -> str:
        """Update B/C/S/E/c/A state; return the stamped mtype."""
        # chr() (latin-1-ish) never raises on a corrupt >0x7F first byte
        # — the frame lands stamped as-is and DECODE quarantines it; a
        # UnicodeDecodeError here would kill the whole receiver instead
        t = chr(payload[0]) if payload else "?"
        if self._chunk_open and t not in ("E",):
            # every message inside a chunk is stream-interior
            return t.lower()
        try:
            if t in ("B", "b"):  # Begin / Begin Prepare open a span
                self._txn_open = True
            elif t in ("C", "P"):  # Commit / Prepare close it
                self._txn_open = False
            elif t == "S":
                (xid,) = struct.unpack_from(">i", payload, 1)
                first = payload[5] != 0
                if first:
                    self._open_streams.add(xid)
                self._chunk_open = True
            elif t == "E":
                self._chunk_open = False
            elif t == "c":
                (xid,) = struct.unpack_from(">i", payload, 1)
                self._open_streams.discard(xid)
            elif t == "p":  # Stream Prepare seals its stream (v2 'P')
                (xid,) = struct.unpack_from(">i", payload, 26)
                self._open_streams.discard(xid)
            elif t == "A":
                xid, sub = struct.unpack_from(">ii", payload, 1)
                if xid == sub:  # whole-transaction abort closes the stream
                    self._open_streams.discard(xid)
            elif t == "r":
                # top-level 'r' is Rollback Prepared: stamp the capture
                # convention's 'x' — the in-chunk-Relation stamp owns
                # lowercase 'r' (the payload keeps the spec's byte)
                return "x"
        except (struct.error, IndexError):
            # a TORN control frame (first byte says 'S'/'c'/'A', body
            # too short to parse) must not kill the receiver: land it
            # un-applied — state stays as-is, so segment cuts stay safe
            # by the last intact frame, and DECODE fails or quarantines
            # the torn frame loudly with its bytes preserved
            pass
        return t

    def _safe_cut(self) -> bool:
        return not (self._txn_open or self._chunk_open or self._open_streams)

    # ---- landing + feedback ----------------------------------------

    def _land(self) -> None:
        if not self._buf:
            return
        import pyarrow as pa
        import pyarrow.parquet as pq

        seg = self.next_seg
        tbl = pa.table(
            {
                "segment": pa.array([seg] * len(self._buf), pa.int64()),
                "lsn": pa.array([r[0] for r in self._buf], pa.int64()),
                "mtype": pa.array([r[1] for r in self._buf], pa.string()),
                "payload": pa.array([r[2] for r in self._buf], pa.binary()),
            }
        )
        final = os.path.join(self.frames_dir, f"seg-{seg:08d}.parquet")
        tmp = os.path.join(self.frames_dir, f".seg-{seg:08d}.parquet.tmp")
        pq.write_table(tbl, tmp)
        os.replace(tmp, final)
        self.flush_lsn = self._buf[-1][0]
        self._buf = []
        self.next_seg += 1
        self.segments_landed += 1

    def _send_status(self, sock: socket.socket, reply: int = 0) -> None:
        lsn1 = self.flush_lsn + 1  # wire carries LSN+1 per the protocol
        sock.sendall(_copy_data(
            b"r" + _STATUS.pack(lsn1, lsn1, lsn1, _now_pg_us(), reply)
        ))

    def _handshake(self, sock: socket.socket, rd: _SockReader) -> None:
        """The psycopg2-LogicalReplicationConnection analog: StartupMessage
        with ``replication=database``, read Authentication/ParameterStatus
        through ReadyForQuery, issue START_REPLICATION (slot, LOGICAL,
        proto_version + publication_names options), expect
        CopyBothResponse."""
        pairs = (("user", "replicator"), ("database", "postgres"),
                 ("replication", "database"))
        body = _I32.pack(196608) + b"".join(
            k.encode() + b"\x00" + v.encode() + b"\x00" for k, v in pairs
        ) + b"\x00"
        sock.sendall(_I32.pack(4 + len(body)) + body)
        while True:
            t = rd.read(1)
            (ln,) = _I32.unpack(rd.read(4))
            mbody = rd.read(ln - 4)
            if t == b"R":
                (code,) = _I32.unpack_from(mbody, 0)
                if code != 0:
                    raise ValueError(f"unsupported authentication code {code}")
            elif t == b"S":
                k, v = mbody.split(b"\x00")[:2]
                self.server_params[k.decode()] = v.decode()
            elif t == b"E":
                raise ValueError(f"server ErrorResponse during startup: {mbody!r}")
            elif t == b"Z":
                break
            else:
                raise ValueError(f"unexpected startup message {t!r}")
        q = (
            f"START_REPLICATION SLOT \"{self.slot}\" LOGICAL 0/0 "
            f"(proto_version '{self.proto_version}', "
            f"publication_names '\"{self.publication}\"')"
        ).encode() + b"\x00"
        sock.sendall(b"Q" + _I32.pack(4 + len(q)) + q)
        t = rd.read(1)
        (ln,) = _I32.unpack(rd.read(4))
        mbody = rd.read(ln - 4)
        if t == b"E":
            raise ValueError(f"START_REPLICATION refused: {mbody!r}")
        if t != b"W":
            raise ValueError(f"expected CopyBothResponse, got {t!r}")

    def run(self) -> None:
        sock = socket.create_connection(self.addr)
        try:
            rd = _SockReader(sock)
            self._handshake(sock, rd)
            while True:
                t = rd.read(1)
                (ln,) = _I32.unpack(rd.read(4))
                body = rd.read(ln - 4)
                if t == b"c":  # CopyDone: land the tail, final ack, leave
                    self._land()
                    self._send_status(sock)
                    return
                if t != b"d":
                    raise ValueError(f"unexpected outer message {t!r}")
                kind = body[0:1]
                if kind == b"k":
                    _we, _ts, reply = _KEEPALIVE.unpack_from(body, 1)
                    if reply:
                        self._send_status(sock, reply=0)
                    continue
                if kind != b"w":
                    raise ValueError(f"unexpected copy payload {kind!r}")
                lsn, _wal_end, _send_ts = _XLOG_HDR.unpack_from(body, 1)
                payload = body[1 + _XLOG_HDR.size:]
                mtype = self._observe(payload)
                self._buf.append((lsn, mtype, bytes(payload)))
                if len(self._buf) >= self.segment_frames and self._safe_cut():
                    self._land()
                    self._send_status(sock)
        finally:
            sock.close()
