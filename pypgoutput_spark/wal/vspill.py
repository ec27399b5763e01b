"""Bounded-memory decode of oversized protocol-v2 streamed transactions.

The vectorized stream path (wal.vdecode) buffers a stream group's Arrow
batches in memory until every streamed transaction in it commits or
aborts — the same bound as the loop kernel, and fine for typical
streams. But PG streams a transaction PRECISELY because it is large
(``logical_decoding_work_mem`` overflow): at 100 TB-deployment scale a
single multi-GB streamed transaction would pin its whole byte range in
one executor task. PostgreSQL's own logical-replication apply worker
solves this by spilling streamed chunks to disk files and replaying
them at commit; this module is the engine's analog:

  - **Pass 1 (while spilling)**: once a group's buffered bytes exceed
    ``spill_bytes``, batches are written to a local Arrow IPC spool
    file as they arrive, and a control-frame scan (S/E/c/p/A + in-chunk
    validation — no tuple parsing) builds a :class:`StreamFates` map:
    per (segment, xid) → first-chunk LSN, seal timestamp, abort /
    subtransaction-abort / foreign-origin sets. Validation is exactly
    the vectorized resolver's grammar (nested chunks, seals inside open
    chunks, unknown/duplicate seals, mis-sequenced chunk xids, in-chunk
    Truncate refusal) so a bad stream fails BEFORE wasting spool disk.
  - **Pass 2 (after the group closes)**: the spool file is re-read one
    Arrow batch at a time and decoded through the ordinary vectorized
    kernel (``vdecode.process_batch``) with :func:`make_fate_resolver`
    substituted for the buffering resolver — in-chunk DML is stamped
    from the fate map with pure offset math, aborted / foreign rows are
    dropped, and NOTHING is buffered: peak memory is one Arrow batch
    plus the fate map (O(#streams), not O(bytes)).

Disk traffic is one sequential write + one sequential read of the
oversized group — the same shape as a Spark shuffle spill. Groups that
stay under ``spill_bytes`` (the overwhelmingly common case) never touch
this module: the grouper yields them in memory exactly as before, so
the flagship path is unchanged. Output is bit-for-bit identical to the
in-memory resolver (pinned by tests/test_stream_spill.py).

Reference parity note: dgea005/pypgoutput pins protocol v1 (reference
reader.py:157-172 — ``proto_version '1'``) and has no streaming mode at
all; this capability is beyond-reference, motivated by the north rule's
10^10-event scale.
"""

from __future__ import annotations

import os
import tempfile
from typing import Iterator, Optional

import numpy as np
import pyarrow as pa

from pypgoutput_spark.wal import codec as _codec
from pypgoutput_spark.wal import vdecode as _v


class StreamFates:
    """Fate map for one spilled stream group, built by pass 1.

    ``first_lsn``: skey → LSN of the first-chunk Stream Start (the
    begin_lsn stamped on the transaction's events). ``seal``: skey →
    commit/prepare timestamp (µs, PG epoch) from 'c' or 'p'.
    ``full_abort`` / ``sub_abort``: skeys of whole-transaction aborts /
    aborted SUBtransaction xids. ``foreign``: skeys of streams whose
    chunks carried an Origin message (dropped at seal when
    ``skip_foreign_origins``). ``carry``: segment → open top-level skey
    of the chunk currently open across batch boundaries (pass-1 state).
    """

    __slots__ = ("first_lsn", "seal", "full_abort", "sub_abort",
                 "foreign", "carry")

    def __init__(self):
        self.first_lsn: dict = {}
        self.seal: dict = {}
        self.full_abort: set = set()
        self.sub_abort: set = set()
        self.foreign: set = set()
        self.carry: dict = {}

    def finalize(self):
        """Undecided check + sorted-array form for pass-2 offset math."""
        undecided = (
            set(self.first_lsn) - set(self.seal) - self.full_abort
        )
        if undecided:
            xids = sorted(int(k) & 0xFFFFFFFF for k in undecided)
            raise ValueError(
                f"streamed transaction(s) still open at spill-group end "
                f"(xids {xids})"
            )
        fk = np.array(sorted(self.first_lsn), dtype=np.int64)
        return _FinalFates(
            fk,
            np.array([self.first_lsn[k] for k in fk], dtype=np.int64),
            np.array(sorted(self.seal), dtype=np.int64),
            np.array([self.seal[k] for k in sorted(self.seal)],
                     dtype=np.int64),
            np.array(sorted(self.full_abort), dtype=np.int64),
            np.array(sorted(self.sub_abort), dtype=np.int64),
            np.array(sorted(self.foreign), dtype=np.int64),
        )


class _FinalFates:
    __slots__ = ("fs_keys", "fs_lsn", "c_keys", "c_cts", "fa_keys",
                 "sub_keys", "fo_keys")

    def __init__(self, fs_keys, fs_lsn, c_keys, c_cts, fa_keys,
                 sub_keys, fo_keys):
        self.fs_keys, self.fs_lsn = fs_keys, fs_lsn
        self.c_keys, self.c_cts = c_keys, c_cts
        self.fa_keys, self.sub_keys, self.fo_keys = (
            fa_keys, sub_keys, fo_keys
        )


def _chunk_walk(first, seg, skey_at, carry):
    """Per-row chunk membership with a cross-batch carry.

    Returns ``(in_chunk, top_key, chunk_before)``: whether each row sits
    inside an S..E block (S/E rows themselves classify open/closed as in
    the in-memory resolver), the block's top-level skey, and the state
    just BEFORE the row (for control-grammar validation). Mutates
    ``carry`` (segment → open top skey) to the state at batch end.
    Segments are contiguous within the sorted partition, so carried
    state applies exactly to each segment's prefix rows that precede any
    same-segment S/E.
    """
    n = first.size
    idx = np.arange(n, dtype=np.int64)
    is_s, is_e = first == _v._S2, first == _v._E2
    last_s = np.maximum.accumulate(np.where(is_s, idx, -1))
    last_e = np.maximum.accumulate(np.where(is_e, idx, -1))
    lsc = np.clip(last_s, 0, None)
    lec = np.clip(last_e, 0, None)
    seen_s = (last_s >= 0) & (seg[lsc] == seg)
    seen_e = (last_e >= 0) & (seg[lec] == seg)
    in_batch = seen_s & (last_s > last_e)
    virgin = ~seen_s & ~seen_e
    carried_open = np.zeros(n, dtype=bool)
    carried_key = np.zeros(n, dtype=np.int64)
    for s_, k_ in carry.items():
        m = virgin & (seg == s_)
        if m.any():
            carried_open |= m
            carried_key[m] = k_
    in_chunk = in_batch | carried_open
    top_key = np.where(in_batch, skey_at[lsc], carried_key)
    chunk_before = np.empty(n, dtype=bool)
    if n:
        chunk_before[1:] = in_chunk[:-1]
        seg_start = np.empty(n, dtype=bool)
        seg_start[0] = True
        seg_start[1:] = seg[1:] != seg[:-1]
        # the first row of each segment run sees the CARRIED state, not
        # the previous (different) segment's
        for i in np.nonzero(seg_start)[0]:
            chunk_before[i] = int(seg[i]) in carry
    # carry-out: per segment, the state after its last row
    useg, first_i = np.unique(seg, return_index=True)
    last_i = np.concatenate([first_i[1:], [n]]) - 1
    for s_, li in zip(useg, last_i):
        if not (seen_s[li] or seen_e[li]):
            continue  # no same-seg S/E this batch: carry unchanged
        if in_chunk[li] and not is_e[li]:
            carry[int(s_)] = int(top_key[li])
        else:
            carry.pop(int(s_), None)
    return in_chunk, top_key, chunk_before


def scan_stream_controls(rb: pa.RecordBatch, fates: StreamFates,
                         skip_foreign_origins: bool = False) -> None:
    """Pass 1 over one batch: update ``fates`` from the stream control
    frames and validate the full in-memory-resolver grammar. Reads only
    first bytes, fixed-offset header ints, and in-chunk xid prefixes —
    never tuple data."""
    data, offs, seg, lsn = _v._payload_arrays(rb)
    n = rb.num_rows
    if n == 0:
        return
    starts = offs[:-1]
    lens = offs[1:] - starts
    if (lens == 0).any():
        i = int(np.nonzero(lens == 0)[0][0])
        raise ValueError(f"empty payload at lsn={lsn[i]}")
    first = data[starts]
    is_s = first == _v._S2
    is_e = first == _v._E2
    is_cm = first == _v._c2
    is_a = first == _v._A2
    is_p = first == _v._SP
    if (is_s & (lens < 6)).any() or (is_cm & (lens < 30)).any() \
            or (is_a & (lens < 9)).any() or (is_p & (lens < 31)).any():
        raise ValueError("truncated protocol-v2 stream control frame")
    skey_at = np.zeros(n, dtype=np.int64)
    s_rows = np.nonzero(is_s)[0]
    if s_rows.size:
        skey_at[s_rows] = _v._skey(
            seg[s_rows], _v._be(data, starts[s_rows] + 1, 4)
        )
    in_chunk, top_key, chunk_before = _chunk_walk(
        first, seg, skey_at, fates.carry
    )
    bad = is_s & chunk_before
    if bad.any():
        i = int(np.nonzero(bad)[0][0])
        raise ValueError(f"nested Stream Start at lsn={lsn[i]}")
    bad = is_e & ~chunk_before
    if bad.any():
        i = int(np.nonzero(bad)[0][0])
        raise ValueError(f"Stream Stop outside a stream block at lsn={lsn[i]}")
    bad = (is_cm | is_a | is_p) & chunk_before
    if bad.any():
        i = int(np.nonzero(bad)[0][0])
        what = "Commit" if is_cm[i] else ("Prepare" if is_p[i] else "Abort")
        raise ValueError(f"Stream {what} inside an open chunk at lsn={lsn[i]}")

    # control bookkeeping in row order — control frames are O(4) per
    # streamed transaction, so a python loop here costs nothing next to
    # the spool write, and gets the open-before-seal ordering exact
    ctrl = np.nonzero(is_s | is_cm | is_a | is_p)[0]
    for i in ctrl:
        t = first[i]
        st = int(starts[i])
        if t == _v._S2:
            key = int(skey_at[i])
            if data[st + 5] != 0:  # first chunk
                if key in fates.first_lsn:
                    raise ValueError(
                        "duplicate first-chunk Stream Start for one xid"
                    )
                fates.first_lsn[key] = int(lsn[i])
            elif key not in fates.first_lsn:
                raise ValueError(
                    f"stream continuation for unknown xid="
                    f"{key & 0xFFFFFFFF} at lsn={lsn[i]}"
                )
            continue
        if t == _v._c2 or t == _v._SP:
            what = "Commit" if t == _v._c2 else "Prepare"
            xoff, coff = (1, 22) if t == _v._c2 else (26, 18)
            key = int(_v._skey(
                seg[i : i + 1], _v._be(data, starts[i : i + 1] + xoff, 4)
            )[0])
            if key not in fates.first_lsn:
                raise ValueError(
                    f"Stream {what} for unknown xid={key & 0xFFFFFFFF} "
                    f"at lsn={lsn[i]}"
                )
            if key in fates.seal:
                raise ValueError("duplicate Stream Commit/Prepare for one xid")
            if key in fates.full_abort:
                raise ValueError(
                    "stream has both a Stream Commit/Prepare and a full "
                    "Stream Abort"
                )
            fates.seal[key] = int(
                _v._be(data, starts[i : i + 1] + coff, 8)[0]
            )
            continue
        # 'A'
        xid = int(_v._be(data, starts[i : i + 1] + 1, 4)[0])
        sub = int(_v._be(data, starts[i : i + 1] + 5, 4)[0])
        key = int(_v._skey(seg[i : i + 1], np.array([xid]))[0])
        if key not in fates.first_lsn:
            raise ValueError(
                f"Stream Abort for unknown xid={xid & 0xFFFFFFFF} "
                f"at lsn={lsn[i]}"
            )
        if xid == sub:
            if key in fates.seal:
                raise ValueError(
                    "stream has both a Stream Commit/Prepare and a full "
                    "Stream Abort"
                )
            fates.full_abort.add(key)
        else:
            fates.sub_abort.add(
                int(_v._skey(seg[i : i + 1], np.array([sub]))[0])
            )

    # in-chunk validation — the SHARED grammar helper (one copy of the
    # rules for all three resolvers); membership answered from the
    # fate map's open-stream bookkeeping
    ctrl_mask = is_s | is_e | is_cm | is_a
    sr = np.nonzero(in_chunk & ~ctrl_mask)[0]
    if sr.size:
        _aux, _dml, _emb, _tk, o_top = _v._classify_in_chunk(
            data, starts, lens, seg, lsn, first, sr, top_key[sr],
            lambda q: np.fromiter(
                (int(k) in fates.first_lsn for k in q),
                dtype=bool, count=q.size,
            ),
            skip_foreign_origins=skip_foreign_origins,
        )
        for k in o_top:
            fates.foreign.add(int(k))


def make_fate_resolver(final: _FinalFates):
    """Pass-2 substitute for ``vdecode._resolve_streams``: stamps and
    drops one batch's rows from the precomputed fate map instead of
    requiring every stream to close inside the batch. Carries chunk
    state across batches in the returned closure."""
    carry: dict = {}

    def resolver(data, offs, seg, lsn, first, idx,
                 ev_xid, ev_blsn, ev_cts, ev_has_tx,
                 skip_foreign_origins: bool = False):
        n = first.size
        starts = offs[:-1]
        is_s = first == _v._S2
        is_e = first == _v._E2
        is_cm = first == _v._c2
        is_a = first == _v._A2
        skey_at = np.zeros(n, dtype=np.int64)
        s_rows = np.nonzero(is_s)[0]
        if s_rows.size:
            skey_at[s_rows] = _v._skey(
                seg[s_rows], _v._be(data, starts[s_rows] + 1, 4)
            )
        in_chunk, top_key, _ = _chunk_walk(first, seg, skey_at, carry)
        drop = is_s | is_e | is_cm | is_a
        shift = np.where(in_chunk & ~drop, 4, 0)
        sr = np.nonzero(in_chunk & ~drop)[0]
        if sr.size:
            # the SHARED grammar helper; validate=False — pass 1 already
            # validated these bytes — but the mis-sequence check still
            # runs here against the group's FULL key set (pass 1 could
            # only test against streams opened so far, so a message
            # referencing a stream opened later in the group must fail
            # here instead of passing as a subxid)
            lens = offs[1:] - starts
            aux, dml, emb_keys, tk, _o = _v._classify_in_chunk(
                data, starts, lens, seg, lsn, first, sr, top_key[sr],
                lambda q: _v._member(final.fs_keys, q)[0],
                validate=False,
            )
            drop[sr[aux]] = True
            if dml.size:
                committed, cpos = _v._member(final.c_keys, tk)
                full_aborted, _ = _v._member(final.fa_keys, tk)
                sub_aborted, _ = _v._member(final.sub_keys, emb_keys)
                stream_foreign, _ = _v._member(final.fo_keys, tk)
                undecided = ~(committed | full_aborted)
                if undecided.any():  # pass 1 guarantees this is empty
                    i = dml[undecided][0]
                    raise ValueError(
                        f"spilled stream xid="
                        f"{int(tk[undecided][0]) & 0xFFFFFFFF} has no fate "
                        f"(event at lsn={lsn[i]})"
                    )
                drop_dml = full_aborted | sub_aborted | stream_foreign
                drop[dml[drop_dml]] = True
                keep = dml[~drop_dml]
                if keep.size:
                    kk = tk[~drop_dml]
                    ev_xid[keep] = (kk & 0xFFFFFFFF).astype(
                        np.uint32
                    ).astype(np.int32).astype(np.int64)
                    _f, bpos = _v._member(final.fs_keys, kk)
                    ev_blsn[keep] = final.fs_lsn[bpos]
                    ev_cts[keep] = final.c_cts[cpos[~drop_dml]]
                    ev_has_tx[keep] = True
        return drop, shift

    return resolver


def _default_spill_dir() -> Optional[str]:
    """Executor-local scratch for the spool file: the first of Spark's
    configured local dirs (``SPARK_LOCAL_DIRS``, which Spark exports to
    python workers — the same disks shuffle spills land on; PySpark's
    own ``shuffle.ExternalMerger`` resolves its spill dirs from the same
    variable), falling back to the system temp dir when unset (plain
    pytest, driver-local decode). Matters operationally: on hosts where
    /tmp is RAM-backed tmpfs, spooling a multi-GB streamed transaction
    there would re-create exactly the memory pressure the spill exists
    to avoid — the provisioned scratch disks are the right target."""
    dirs = os.environ.get("SPARK_LOCAL_DIRS")
    if dirs:
        first = dirs.split(",")[0].strip()
        if first and os.path.isdir(first):
            return first
    return None


class SpilledGroup:
    """A stream group that overflowed ``spill_bytes``: its batches live
    in an Arrow IPC spool file; ``fates`` carries the pass-1 result."""

    __slots__ = ("path", "fates")

    def __init__(self, path: str, fates: StreamFates):
        self.path = path
        self.fates = fates


def group_stream_batches_spill(
    batches: Iterator[pa.RecordBatch], spill_bytes: int,
    skip_foreign_origins: bool = False,
    spill_dir: Optional[str] = None,
):
    """Spill-aware variant of ``vdecode._group_stream_batches``: groups
    under ``spill_bytes`` yield as in-memory batch lists (identical to
    the default grouper); a group that overflows switches to the spool
    file + pass-1 scan and yields a :class:`SpilledGroup`. Memory held
    is bounded by ``spill_bytes`` plus one Arrow batch."""
    pending: list = []
    pending_bytes = 0
    open_keys: set = set()
    writer = None
    path = None
    fates: Optional[StreamFates] = None
    try:
        for rb in batches:
            if rb.num_rows == 0:
                continue
            has_v2, opened, closed = _v._quick_scan(rb)
            if writer is None and not pending and not has_v2:
                yield [rb]
                continue
            open_keys.update(opened)
            open_keys.difference_update(closed)
            if writer is None:
                pending.append(rb)
                pending_bytes += rb.nbytes
                if pending_bytes > spill_bytes and open_keys:
                    # overflow: scan + spool everything buffered so far
                    fates = StreamFates()
                    fd, path = tempfile.mkstemp(
                        prefix="pgoutput_stream_spill_", suffix=".arrow",
                        dir=spill_dir if spill_dir is not None
                        else _default_spill_dir(),
                    )
                    os.close(fd)
                    writer = pa.ipc.new_file(path, pending[0].schema)
                    for b in pending:
                        scan_stream_controls(
                            b, fates,
                            skip_foreign_origins=skip_foreign_origins,
                        )
                        writer.write_batch(b)
                    pending = []
                    pending_bytes = 0
            else:
                scan_stream_controls(
                    rb, fates, skip_foreign_origins=skip_foreign_origins
                )
                writer.write_batch(rb)
            if not open_keys:
                if writer is not None:
                    writer.close()
                    writer = None
                    yield SpilledGroup(path, fates)
                    path = None
                    fates = None
                elif pending:
                    yield pending
                    pending = []
                    pending_bytes = 0
        if pending or writer is not None:
            xids = sorted({int(k) & 0xFFFFFFFF for k in open_keys})
            raise ValueError(
                f"streamed transaction(s) still open at partition end "
                f"(xids {xids}): cut batches on segment boundaries "
                "(split='segment' / whole-segment files)"
            )
    finally:
        if writer is not None:
            writer.close()
        if path is not None and os.path.exists(path):
            os.unlink(path)


def decode_spilled_group(group: SpilledGroup, open_tx: dict,
                         registry_plain: dict,
                         skip_foreign_origins: bool = False,
                         foreign_segs: Optional[set] = None):
    """Pass 2: re-read the spool one batch at a time through the
    ordinary vectorized kernel with the fate resolver substituted.
    Deletes the spool file when done."""
    final = group.fates.finalize()
    resolver = make_fate_resolver(final)
    try:
        with pa.ipc.open_file(group.path) as reader:
            for bi in range(reader.num_record_batches):
                yield from _v.process_batch(
                    reader.get_batch(bi), open_tx, registry_plain,
                    skip_foreign_origins=skip_foreign_origins,
                    foreign_segs=foreign_segs,
                    stream_resolver=resolver,
                )
    finally:
        if os.path.exists(group.path):
            os.unlink(group.path)
