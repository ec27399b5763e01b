"""Live WAL source seam: spool → receiver → segment-aligned frame files.

A real deployment of this engine puts one small, dumb process next to
Postgres: it consumes the replication socket byte stream and lands frames
in shared storage, acking the flush LSN back to the server — the
reference's ``consume_stream`` / ``send_feedback`` loop (reference
reader.py:334-390). The Spark pipeline then tails the landed files
(``stream_ingest``). This module is that seam, built against the sandbox's
deterministic generator instead of a socket:

  - **live frame encoding without Spark**: the generator's logical event
    stream is plain SQL over an index — DuckDB evaluates the identical
    expressions (``duckdb_events_sql``) and the existing pandas encoder
    kernel (``wal.generator._encode_stream_pandas``) produces
    byte-identical frames (pinned by tests/test_receiver_live.py), so an
    unbounded producer process needs no JVM.
  - **spool**: the producer appends binary chunk files (length-prefixed
    frames, tmp-write + atomic rename) — the socket-byte-stream analog. A
    ``DONE`` marker ends the stream.
  - **receiver**: tails the spool, groups frames by WAL segment, and
    lands each COMPLETE segment as one parquet file (atomic rename). One
    whole segment per file means the Spark side can run
    ``stream_ingest(clustered=True)`` — the zero-shuffle decode path —
    and the monotone watermark guard holds. After each landed file it
    atomically rewrites the **ack file** with the flush LSN (the
    ``send_feedback(flush_lsn)`` analog): the producer may truncate the
    spool up to it, and a restarted receiver resumes from the landed
    segment set (idempotent — a re-parsed chunk whose segments already
    landed is skipped).
"""

from __future__ import annotations

import os
import struct
import threading
import time
from typing import Dict, Iterator, List, Optional

from pypgoutput_spark.wal import codec
from pypgoutput_spark.wal.generator import (
    RELATION_COLUMNS,
    RELATION_ID,
    RELATION_NAMES,
    RELATION_NAMESPACE,
    GenParams,
    _encode_stream_pandas,
    duckdb_events_sql,
)

#: spool record header: segment, lsn, mtype byte, payload length
_REC = struct.Struct(">qqBi")
DONE_MARKER = "DONE"


# ---------------------------------------------------------------------------
# Spark-free frame production (the producer side of the seam)
# ---------------------------------------------------------------------------


def _txn_draw(p: GenParams, tag: str, txn) -> "object":
    """Replicate the generator's md5 txn draw (`stream_exprs`) in numpy:
    the 15-hex-digit prefix of md5(seed || tag || txn) as a bigint."""
    import hashlib

    import numpy as np

    return np.array(
        [
            int(hashlib.md5(f"{p.seed}{tag}{t}".encode()).hexdigest()[:15], 16)
            for t in np.asarray(txn).tolist()
        ],
        dtype=np.int64,
    )


def logical_slots_pdf(p: GenParams, txn_lo: int = 0, txn_hi: Optional[int] = None):
    """Pandas slot table (LSN-ordered) for a txn range — the same layout
    ``spark_frames_df`` builds with Spark SQL, evaluated through DuckDB;
    covers protocol-v2 streamed transactions (``stream_pct``) — including
    ``interleave_streams`` chunk pairs — with the identical md5 txn draws
    and LSN remaps (byte parity pinned by tests/test_receiver_live.py).
    Producer processes call this incrementally; with interleaving, cut
    txn ranges on EVEN boundaries so a pair's two halves share a chunk."""
    import duckdb
    import numpy as np
    import pandas as pd

    txn_hi = p.n_txns if txn_hi is None else min(txn_hi, p.n_txns)
    ops, stride, tps = p.ops_per_txn, p.lsn_stride, p.txns_per_segment
    lo_i, hi_i = txn_lo * ops, txn_hi * ops
    ev = (
        duckdb.sql(
            f"SELECT * FROM ({duckdb_events_sql(p)}) WHERE i >= {lo_i} AND i < {hi_i}"
        )
        .df()
        .sort_values("i")
        .reset_index(drop=True)
    )
    i = ev["i"].to_numpy()
    txn = i // ops

    def streamed_of(txns):
        if p.stream_pct <= 0:
            return np.zeros(len(np.asarray(txns)), dtype=bool)
        return (_txn_draw(p, ":stream:", txns) % 100) < p.stream_pct

    def aborted_of(txns):
        if p.stream_pct <= 0:
            return np.zeros(len(np.asarray(txns)), dtype=bool)
        return streamed_of(txns) & (
            (_txn_draw(p, ":abort:", txns) % 100) < p.stream_abort_pct
        )

    def prepared_of(txns):
        if p.two_phase_pct <= 0:
            return np.zeros(len(np.asarray(txns)), dtype=bool)
        return (_txn_draw(p, ":2pc:", txns) % 100) < p.two_phase_pct

    def rolled_of(txns):
        if p.two_phase_pct <= 0:
            return np.zeros(len(np.asarray(txns)), dtype=bool)
        return prepared_of(txns) & (
            (_txn_draw(p, ":2pcrb:", txns) % 100) < p.two_phase_rollback_pct
        )

    def foreign_of(txns):
        if p.origin_pct <= 0:
            return np.zeros(len(np.asarray(txns)), dtype=bool)
        return (_txn_draw(p, ":origin:", txns) % 100) < p.origin_pct

    interleaving = p.interleave_streams and p.stream_pct > 0

    def interleaved_of(txns):
        """Is this txn half of an interleaved chunk pair — both members
        of the adjacent pair (2k, 2k+1) drew streamed (generator's
        interleave_exprs, replicated; O(n_txns) control-frame use only)."""
        t = np.asarray(txns)
        if not interleaving:
            return np.zeros(len(t), dtype=bool)
        partner = np.where(t % 2 == 0, t + 1, t - 1)
        return streamed_of(t) & streamed_of(partner) & (partner < p.n_txns)

    h1 = (ops + 1) // 2  # first-chunk DML count (generator layout)
    # event lsn/segment/streamed come from the DuckDB event query itself
    # (duckdb_events_sql emits the interleave LSN remap and the stream
    # draw per event) — ONE closed-form source, no numpy re-derivation
    # to drift from generator._interleave_event_lsn
    o = pd.DataFrame(
        {
            "segment": ev["segment"].to_numpy(),
            "txn": txn,
            "kind": "O",
            "lsn": ev["lsn"].to_numpy(),
            "commit_ts_us": txn * 1_000_000,
            "xid": 1000 + txn,
            "rel": ev["rel"].to_numpy(),
            "op": ev["op"],
            "repo": ev["repo"],
            "path": ev["path"],
            "commit": ev["commit"],
            "lang": ev["lang"],
            "content": ev["content"],
            "content_unchanged": ev["content_unchanged"].astype(bool),
            "old_repo": ev["old_repo"],
            "old_path": ev["old_path"],
            "streamed": ev["streamed"].to_numpy().astype(bool),
        }
    )
    txns = np.arange(txn_lo, txn_hi)
    strm = streamed_of(txns)
    abrt = aborted_of(txns)
    il = interleaved_of(txns)
    prep = prepared_of(txns)
    rb = rolled_of(txns)

    def bc(kind_arr, slot: int, sel=None, il_off=None) -> "pd.DataFrame":
        tt = txns if sel is None else txns[sel]
        kk = kind_arr if isinstance(kind_arr, str) else np.asarray(kind_arr)[
            slice(None) if sel is None else sel
        ]
        lsn = 10 + tt * stride + slot
        if il_off is not None:
            # interleaved pairs place this control frame at a fixed
            # per-half offset inside the pair's combined LSN window
            # (generator spark_frames_df off_p0/off_p1 layout)
            il_sel = il if sel is None else il[sel]
            lsn = np.where(
                il_sel,
                10 + (tt - tt % 2) * stride
                + np.where(tt % 2 == 0, il_off[0], il_off[1]),
                lsn,
            )
        return pd.DataFrame(
            {
                "segment": tt // tps,
                "txn": tt,
                "kind": kk,
                "lsn": lsn,
                "commit_ts_us": tt * 1_000_000,
                "xid": 1000 + tt,
                "rel": 0,
                "op": None,
                "repo": None,
                "path": None,
                "commit": None,
                "lang": None,
                "content": None,
                "content_unchanged": False,
                "old_repo": None,
                "old_path": None,
                "streamed": strm if sel is None else strm[sel],
            }
        )

    composed = p.two_phase_pct > 0 and p.stream_pct > 0
    # origin layout (v1 + serial streams; interleave/two-phase refused
    # by the GenParams guard): 'O' at slot 1 shifts every closer by one
    originating = p.origin_pct > 0
    closer_slot = ops + 2 if originating else ops + 1
    parts = [
        o,
        bc(np.where(strm, "S", np.where(prep, "b", "B")), 0,
           il_off=(0, h1 + 2)),
        bc(np.where(strm, "E", np.where(prep, "P", "C")), closer_slot,
           il_off=(h1 + 1, 2 * h1 + 3)),
    ]
    if originating:
        fg = foreign_of(txns)
        if fg.any():
            # the Origin frame sits at slot 1, between Begin and the
            # (shifted) first DML — the generator's origin layout
            parts.append(bc("g", 1, sel=fg))
    if p.stream_pct > 0 and strm.any():
        # slot ops+2: interleaved pairs open their SECOND chunk ('s',
        # first_segment=0); serial streams commit, abort, or — drawing
        # prepared too — seal with Stream Prepare 'p' here
        closer = np.where(il, "s", np.where(abrt, "A", "c"))
        if composed:
            closer = np.where(prep, "p", closer)
        parts.append(bc(
            closer, ops + 3 if originating else ops + 2, sel=strm,
            il_off=(2 * h1 + 4, h1 + ops + 6),
        ))
        if interleaving and il.any():
            parts.append(bc("E", ops + 3, sel=il,
                            il_off=(h1 + ops + 5, 2 * ops + 7)))
            parts.append(bc(np.where(abrt, "A", "c"), ops + 4, sel=il,
                            il_off=(2 * ops + 8, 2 * ops + 9)))
    if p.two_phase_pct > 0 and prep.any():
        # the DECISION frame for prepared txn t lands in window t+gap
        # (generator layout: slot ops+2, or ops+3 when composed), with
        # that window's segment and a later commit timestamp
        gap = p.two_phase_gap
        dslot = ops + 3 if composed else ops + 2
        tt = txns[prep]
        parts.append(pd.DataFrame(
            {
                "segment": (tt + gap) // tps,
                "txn": tt,
                "kind": np.where(rb[prep], "r", "K"),
                "lsn": 10 + (tt + gap) * stride + dslot,
                "commit_ts_us": (tt + gap) * 1_000_000 + 1,
                "xid": 1000 + tt,
                "rel": 0,
                "op": None,
                "repo": None,
                "path": None,
                "commit": None,
                "lang": None,
                "content": None,
                "content_unchanged": False,
                "old_repo": None,
                "old_path": None,
                "streamed": strm[prep],
            }
        ))
    slots = pd.concat(parts, ignore_index=True)
    return slots.sort_values("lsn", kind="stable").reset_index(drop=True)


def relation_frames_pdf(p: GenParams):
    """The R-frame cohort (segment 0, lsn 1+r) — identical to the
    generator's ``include_relation`` rows."""
    import pandas as pd

    rows = []
    for r in range(max(1, p.n_relations)):
        rows.append(
            {
                "segment": 0,
                "lsn": 1 + r,
                "mtype": "R",
                "payload": codec.encode_relation(
                    RELATION_ID + r,
                    RELATION_NAMESPACE,
                    RELATION_NAMES[r] if r < len(RELATION_NAMES) else f"repo_files_{r + 1}",
                    "d",
                    RELATION_COLUMNS,
                ),
            }
        )
    return pd.DataFrame(rows)


def encode_frames_pdf(p: GenParams, txn_lo: int = 0, txn_hi: Optional[int] = None,
                      include_relation: bool = False):
    """Binary WAL frames for a txn range, as pandas — the producer's unit
    of spooling. Byte-identical to ``spark_frames_df`` for the same
    params (parity pinned by tests)."""
    import pandas as pd

    if p.evolve_at_txn > 0:
        # the slot frames carry no stars column and this layout has no
        # home for the mid-stream Relation re-send — refuse rather than
        # spool a stream that silently decodes 6-cell tuples against
        # the 5-column relation
        raise ValueError(
            "evolve_at_txn is not supported by the receiver producer"
        )
    if p.two_phase_pct > 0 and (txn_lo != 0 or (txn_hi or p.n_txns) < p.n_txns):
        # a prepared txn's decision frame lands ``two_phase_gap`` windows
        # later: an incremental txn range would emit those decisions out
        # of LSN order relative to later ranges' own frames — refuse
        # rather than spool a non-monotone stream
        raise ValueError(
            "two_phase_pct requires spooling the full txn range in one "
            "call (decision frames land two_phase_gap windows later)"
        )
    slots = logical_slots_pdf(p, txn_lo, txn_hi)
    frames = pd.concat(list(_encode_stream_pandas(iter([slots]), p)), ignore_index=True)
    if include_relation:
        frames = pd.concat([relation_frames_pdf(p), frames], ignore_index=True)
    return frames


# ---------------------------------------------------------------------------
# spool (producer side)
# ---------------------------------------------------------------------------


class SpoolWriter:
    """Appends frame chunks to a spool directory: binary length-prefixed
    records, one file per chunk, tmp-write + atomic rename (a reader
    never sees a torn chunk). ``finish()`` writes the DONE marker."""

    def __init__(self, spool_dir: str):
        self.dir = spool_dir
        os.makedirs(spool_dir, exist_ok=True)
        self.seq = 0

    def write_chunk(self, frames_pdf) -> str:
        buf = bytearray()
        for seg, lsn, mtype, payload in zip(
            frames_pdf["segment"].tolist(), frames_pdf["lsn"].tolist(),
            frames_pdf["mtype"].tolist(), frames_pdf["payload"].tolist(),
        ):
            payload = bytes(payload)
            buf += _REC.pack(int(seg), int(lsn), ord(mtype), len(payload))
            buf += payload
        final = os.path.join(self.dir, f"chunk-{self.seq:08d}.bin")
        tmp = final + ".tmp"
        with open(tmp, "wb") as f:
            f.write(bytes(buf))
        os.replace(tmp, final)
        self.seq += 1
        return final

    def finish(self) -> None:
        with open(os.path.join(self.dir, DONE_MARKER + ".tmp"), "w") as f:
            f.write("done")
        os.replace(
            os.path.join(self.dir, DONE_MARKER + ".tmp"),
            os.path.join(self.dir, DONE_MARKER),
        )


def read_spool_chunk(path: str) -> Iterator[tuple]:
    """Yield (segment, lsn, mtype, payload) records from one chunk file."""
    with open(path, "rb") as f:
        data = f.read()
    off = 0
    while off < len(data):
        seg, lsn, mt, plen = _REC.unpack_from(data, off)
        off += _REC.size
        yield seg, lsn, chr(mt), data[off:off + plen]
        off += plen


# ---------------------------------------------------------------------------
# receiver (the consume_stream analog)
# ---------------------------------------------------------------------------


class FrameReceiver:
    """Tails a spool directory and lands whole WAL segments as parquet
    frame files in ``frames_dir``, acking the flush LSN after every
    landed file. Restart-safe: already-landed segments are skipped."""

    def __init__(self, spool_dir: str, frames_dir: str,
                 ack_path: Optional[str] = None):
        self.spool_dir = spool_dir
        self.frames_dir = frames_dir
        self.ack_path = ack_path or os.path.join(frames_dir, "_ack")
        os.makedirs(spool_dir, exist_ok=True)  # may start before the producer
        os.makedirs(frames_dir, exist_ok=True)
        self._landed = {
            int(name[4:12])
            for name in os.listdir(frames_dir)
            if name.startswith("seg-") and name.endswith(".parquet")
        }
        # track consumption by SEQUENCE NUMBER, not list position: the
        # producer may truncate acked chunks (the module contract), which
        # would shift positional indexing past unread chunks
        self._consumed_seq = -1
        self._buffers: Dict[int, List[tuple]] = {}
        self.flush_lsn = self._read_ack()

    def _read_ack(self) -> int:
        try:
            with open(self.ack_path) as f:
                return int(f.read().strip())
        except (OSError, ValueError):
            return -1

    def _write_ack(self) -> None:
        tmp = self.ack_path + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(self.flush_lsn))
        os.replace(tmp, self.ack_path)

    def _land_segment(self, seg: int) -> None:
        rows = self._buffers.pop(seg, [])
        if seg in self._landed:
            return  # restart replay of an already-landed segment
        if not rows:
            return
        import pyarrow as pa
        import pyarrow.parquet as pq

        rows.sort(key=lambda r: r[1])
        tbl = pa.table(
            {
                "segment": pa.array([r[0] for r in rows], pa.int64()),
                "lsn": pa.array([r[1] for r in rows], pa.int64()),
                "mtype": pa.array([r[2] for r in rows], pa.string()),
                "payload": pa.array([r[3] for r in rows], pa.binary()),
            }
        )
        final = os.path.join(self.frames_dir, f"seg-{seg:08d}.parquet")
        # dot-prefixed staging: Spark's file listing ignores hidden
        # files, so the concurrently tailing stream never sees a
        # footer-less half-written parquet before the atomic rename
        tmp = os.path.join(self.frames_dir, f".seg-{seg:08d}.parquet.tmp")
        pq.write_table(tbl, tmp)
        os.replace(tmp, final)
        self._landed.add(seg)
        self.flush_lsn = max(self.flush_lsn, rows[-1][1])
        self._write_ack()

    def poll_once(self) -> int:
        """Consume any new spool chunks; land every segment that is
        complete (a later segment's frames have appeared — the monotone
        segment contract). Returns the number of files landed."""
        chunks = sorted(
            (int(name[6:14]), name)
            for name in os.listdir(self.spool_dir)
            if name.startswith("chunk-") and name.endswith(".bin")
        )
        landed = 0
        for seq, name in chunks:
            if seq <= self._consumed_seq:
                continue
            for seg, lsn, mt, payload in read_spool_chunk(
                os.path.join(self.spool_dir, name)
            ):
                open_before = [s for s in self._buffers if s < seg]
                for s in sorted(open_before):
                    self._land_segment(s)
                    landed += 1
                self._buffers.setdefault(seg, []).append((seg, lsn, mt, payload))
            self._consumed_seq = seq
        return landed

    def finish(self) -> None:
        """Land trailing open segments — ONLY valid at DONE (the producer
        wrote everything). A stopped-early receiver must NOT land its
        partial buffers: the segment file would be incomplete, and a
        restarted receiver would skip the segment as already-landed —
        leaving buffers unlanded keeps the restart replay exact."""
        for s in sorted(self._buffers):
            self._land_segment(s)

    def done(self) -> bool:
        return os.path.exists(os.path.join(self.spool_dir, DONE_MARKER))

    def run(self, poll_interval: float = 0.05,
            stop: Optional[threading.Event] = None) -> None:
        """Tail until the producer writes DONE; ``stop`` exits WITHOUT
        landing partial segments (restart-safe — see :meth:`finish`)."""
        while not (stop and stop.is_set()):
            self.poll_once()
            if self.done():
                self.poll_once()
                self.finish()
                return
            time.sleep(poll_interval)
