"""Dead-letter repair: replay quarantined frames after a decoder fix.

The non-strict pipeline quarantines undecodable messages as op='E' rows
(``segment``, ``lsn``, ``error`` — operators/decode.py dead-letter unit,
the recoverable alternative to the reference's tear-down-on-error,
reference reader.py:326-331). The quarantine deliberately stores no
payload bytes: the WAL frames store is the durable source of truth, so
repair re-reads the frames. Once the decode defect is fixed (or the
corrupt frames re-fetched), :func:`replay_quarantine` folds the lost
changes back into the table(s) **exactly**:

1. Pending = quarantine rows minus the ``<dir>_repaired`` ledger.
2. The frames WINDOW from the earliest pending segment onward is
   re-decoded (strict by default — a frame that still fails aborts the
   repair loudly rather than silently re-quarantining).
3. Affected keys = keys of re-decoded events at pending LSNs.
4. For those keys only, the window's events are LWW-collapsed and
   merged. **Why this is exact**: LSNs are monotone across segments, so
   a key with any event in the window has its global-latest event in
   the window — the window LWW *is* the key's true final state,
   regardless of what normal ingest already applied, folded, or
   compacted (later deletes and TOAST carriers included; a same-window
   truncate voids events before it exactly as ingest did). Keys with no
   pending event are untouched.
5. The merge commits as a **repair**: watermark unchanged (repair never
   acks new LSNs), deltas appended through the normal merge-on-read
   path so readers/compaction/CDF treat them like any commit.
6. Pending rows are appended to the ledger. A crash between 5 and 6
   re-applies the same deltas on rerun — LWW-idempotent, same values.

Scale shape: one metadata stats pass + one strict decode over the
window (∝ window size, not table size), pending/affected-key joins are
small-side (AQE broadcasts them), merge cost ∝ affected keys. Contract:
the window must start on a frame-file boundary that doesn't split a
transaction or v2 stream — guaranteed by the receiver/walsock safe-cut
landing rule (sources/receiver.py, sources/walsock.py).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Union

from pyspark.sql import functions as F

from pypgoutput_spark.lake.table import LakeTable
from pypgoutput_spark.operators import decode as decode_op
from pypgoutput_spark.operators.lww import lww_changes_flat
from pypgoutput_spark.operators.merge import merge_into
from pypgoutput_spark.plans.registry import RelationRegistry
from pypgoutput_spark.streaming.pipeline import (
    RELATION_ID,
    _explode_key_changes,
    _mtype_pred,
    project_all_versions,
)
from pypgoutput_spark.wal import codec as _codec

BASE_COLS = ["lsn", "op", "xid", "begin_lsn", "commit_ts_us"]


def replay_quarantine(
    spark,
    frames,
    tables: Union[LakeTable, Dict[int, LakeTable]],
    quarantine_dir: str,
    relation_id: int = RELATION_ID,
    strict: bool = True,
    clustered: bool = False,
    kc_toast_passes: int = 0,
    stream_spill_bytes: Optional[int] = None,
) -> dict:
    """Repair the quarantined messages' effects. Returns metrics:
    ``repaired`` (ledgered quarantine rows), ``affected_keys`` and merge
    metrics per relation. ``frames`` must be the same durable frame
    source ingest consumes (repair re-reads payloads from it).

    Pass the INGEST run's ``stream_spill_bytes`` here too: the repair
    window re-decodes the same frames, so a streamed transaction that
    needed the bounded-memory spill during ingest needs it again during
    repair — omitting it would re-buffer that transaction's whole byte
    range in one task, the OOM the ingest config existed to avoid."""
    single = isinstance(tables, LakeTable)
    table_map = {relation_id: tables} if single else dict(tables)

    pending = spark.read.parquet(quarantine_dir).select("segment", "lsn").distinct()
    ledger_dir = quarantine_dir.rstrip("/") + "_repaired"
    if os.path.isdir(ledger_dir):
        done = spark.read.parquet(ledger_dir).select("segment", "lsn")
        pending = pending.join(done, ["segment", "lsn"], "left_anti")
    head = pending.agg(
        F.min("segment").alias("s0"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    if not head["n"]:
        return {"skipped": True, "reason": "nothing-pending", "repaired": 0}
    s0, n_pending = int(head["s0"]), int(head["n"])

    # registry from the FULL stream: Relation frames may predate the window
    registry = RelationRegistry.from_frames(frames)
    window = frames.filter(F.col("segment") >= s0)

    # window truncates: DML at or before a same-relation T is void — for
    # repair that means those pending events need (and get) no merge
    t_rows = (
        window.filter(_mtype_pred(window, "T"))
        .select("lsn", "payload").collect()
    )
    t_lsn_by_rid: Dict[int, int] = {}
    for row in t_rows:
        for rid in _codec.decode_message(bytes(row["payload"]))["relation_ids"]:
            t_lsn_by_rid[rid] = max(t_lsn_by_rid.get(rid, -1), int(row["lsn"]))

    raw = decode_op.decode_frames_raw(
        window, registry, strict=strict, clustered=clustered, open_tx=None,
        stream_spill_bytes=stream_spill_bytes,
    )
    pend_lsns = pending.select("lsn")

    out: dict = {
        "skipped": False, "repaired": n_pending,
        "window_from_segment": s0, "relations": {},
    }
    for rid, tbl in table_map.items():
        if not registry.versions(rid):
            continue
        snap = tbl.snapshot()
        keys = snap["key_cols"]
        value_cols = [n for n, _ in snap["schema"] if n not in keys]
        proj = project_all_versions(
            raw, registry, rid, keys, value_cols, BASE_COLS
        )
        if rid in t_lsn_by_rid:
            proj = proj.filter(F.col("lsn") > t_lsn_by_rid[rid])
        if kc_toast_passes > 0:
            from pypgoutput_spark.operators.kc_toast import resolve_kc_toast

            proj = resolve_kc_toast(
                proj, tbl, keys, value_cols, passes=kc_toast_passes
            )
        # explode BEFORE affected-key detection: a key-change UPDATE at a
        # pending LSN contributes both its old-key delete carrier and its
        # new-key upsert, so both keys count as affected
        exploded = _explode_key_changes(
            proj, keys, value_cols, BASE_COLS,
            guard_kc_toast=kc_toast_passes == 0,
        )
        # keys whose events include a pending LSN; both join sides the
        # planner sees here are tiny (pending ≪ stream) — AQE broadcasts
        affected = (
            exploded.join(pend_lsns, "lsn", "semi")
            .select(*keys).distinct()
        )
        scoped = exploded.join(affected, list(keys), "semi")
        changes = lww_changes_flat(scoped, keys, value_cols)
        m = merge_into(tbl, changes, watermark_lsn=-1, repair=True)
        out["relations"][rid] = m

    # ledger AFTER every merge committed: a crash before this line makes
    # the rerun re-apply identical deltas (LWW-idempotent), never skip
    pending.write.mode("append").parquet(ledger_dir)
    if single:
        out.update(out["relations"].get(relation_id, {}))
    return out
