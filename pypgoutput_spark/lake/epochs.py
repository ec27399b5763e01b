"""Cross-table consistency points (epochs) for multi-relation CDC.

A PostgreSQL transaction can touch many relations; the pipeline routes
one WAL batch into per-relation LakeTables, each with its own atomic
snapshot commit. Those per-table publishes happen at different
instants, so a consumer that joins two mirrors can read relation A at
batch N and relation B at batch N-1 — torn cross-table state, even
though each table alone is consistent. (Iceberg and Delta have the same
gap: no multi-table transactions.)

The epoch log closes the window at O(1) cost per batch: after ALL of a
batch's merges have landed, ONE record

    {"epoch": E, "watermark_lsn": W, "tables": {rid: version}}

is published with the same atomic-rename pattern as a table's CURRENT
pointer. Readers resolve the epoch once, then read every table AT its
pinned snapshot version — mutually consistent to the batch boundary no
matter what commits later. Old epochs double as cross-table time
travel. The per-table commits stay exactly as they are (crash recovery,
exactly-once and idempotent replay are per-table concerns and already
proven); a crash between the last merge and the epoch publish leaves
the PREVIOUS epoch current — consistent, merely one batch stale — and
the replayed batch re-publishes it.

Epoch records reference table versions, so `expire_snapshots` retention
must keep at least the versions the oldest live epoch pins (the same
retention contract the change feed already imposes).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

from pypgoutput_spark.lake.table import _atomic_write, _commit_lock, _write_json

CURRENT = "CURRENT"


class EpochLog:
    def __init__(self, path: str):
        self.path = path.rstrip("/")
        self.log_dir = os.path.join(self.path, "epochs")
        if not os.path.exists(os.path.join(self.path, CURRENT)):
            raise FileNotFoundError(f"not an EpochLog (no CURRENT): {path}")

    @classmethod
    def create(cls, path: str) -> "EpochLog":
        path = path.rstrip("/")
        os.makedirs(os.path.join(path, "epochs"), exist_ok=True)
        _write_json(
            os.path.join(path, "epochs", "e00000000.json"),
            {"epoch": 0, "watermark_lsn": -1, "tables": {}},
        )
        _atomic_write(os.path.join(path, CURRENT), "0")
        return cls(path)

    def current_epoch(self) -> int:
        with open(os.path.join(self.path, CURRENT)) as f:
            return int(f.read().strip())

    def record(self, epoch: Optional[int] = None) -> dict:
        e = self.current_epoch() if epoch is None else epoch
        with open(os.path.join(self.log_dir, f"e{e:08d}.json")) as f:
            return json.load(f)

    def publish(self, versions: Dict[int, int], watermark_lsn: int) -> int:
        """Publish the next epoch pinning ``{relation_id: table_version}``.
        Call AFTER every table's merge for the batch has committed.

        The read-increment-write of CURRENT runs under the same commit
        file-lock the tables use: two writers sharing one log (a batch
        backfill racing a live stream, a supervisor restart overlapping
        the old process's last batch) serialize instead of the second
        silently clobbering the first's record. Because a STALE writer's
        payload was computed before it waited on the lock, the new
        record is merged FORWARD against the current one under the lock
        (element-wise max of versions, max watermark): per-table commits
        are monotone, so the merge of two consistent batch boundaries is
        itself a consistent, never-regressing boundary — a stalled
        backfill can no longer publish an epoch that pins older state
        than its predecessor."""
        with _commit_lock(self.path):
            prev = self.record()
            e = prev["epoch"] + 1
            merged = {str(r): int(v) for r, v in versions.items()}
            for r, v in prev["tables"].items():
                if merged.get(r, -1) < v:
                    merged[r] = v
            _write_json(
                os.path.join(self.log_dir, f"e{e:08d}.json"),
                {
                    "epoch": e,
                    "watermark_lsn": max(watermark_lsn, prev["watermark_lsn"]),
                    "tables": merged,
                },
            )
            _atomic_write(os.path.join(self.path, CURRENT), str(e))
        return e

    def _record_names(self) -> list:
        """Committed epoch record files only — a crashed _write_json
        leaves a ``*.json.tmp`` that must never be parsed (the exact
        crash window this log heals), and stray files never raise."""
        return sorted(
            n for n in os.listdir(self.log_dir)
            if n.startswith("e") and n.endswith(".json")
            and n[1:9].isdigit()
        )

    def expire(self, keep_last: int = 10) -> list:
        """Drop all but the newest ``keep_last`` epoch records (epoch 0,
        the empty genesis, is never a retention anchor). Returns the
        expired epoch ids. Run BEFORE the tables' ``expire_snapshots``
        so :meth:`retention_floor` reflects only surviving epochs.
        Serialized under the publish lock."""
        with _commit_lock(self.path):
            current = self.current_epoch()
            cutoff = current - keep_last + 1
            expired = []
            for name in self._record_names():
                e = int(name[1:9])
                if e < cutoff and e != current:
                    os.unlink(os.path.join(self.log_dir, name))
                    expired.append(e)
            return expired

    def retention_floor(self) -> Dict[int, int]:
        """Per relation, the OLDEST table version any surviving epoch
        pins — pass as ``expire_snapshots(keep_from_version=...)`` so
        table GC never reclaims a snapshot a live epoch still reads.
        A record unlinked by a concurrently running :meth:`expire` is
        simply no longer a retention anchor — skipped, not an error."""
        floor: Dict[int, int] = {}
        for name in self._record_names():
            try:
                with open(os.path.join(self.log_dir, name)) as f:
                    rec = json.load(f)
            except FileNotFoundError:
                continue  # expired between listdir and open
            for rid, v in rec["tables"].items():
                r = int(rid)
                floor[r] = min(floor.get(r, v), v)
        return floor

    def read_all(self, tables: Dict[int, "object"], epoch: Optional[int] = None):
        """Mutually consistent DataFrames — each table read AT the
        version the epoch pins (tables absent from the record were not
        yet created at that epoch and are omitted)."""
        rec = self.record(epoch)
        pinned = rec["tables"]
        return {
            rid: t.read(version=pinned[str(rid)])
            for rid, t in tables.items()
            if str(rid) in pinned
        }
