"""Relation schema registry: discovery, versioning, evolution planning.

Spark-first re-expression of the reference's driver-side schema caches
(reference reader.py:124-132, 195-243): Relation ('R') messages are a
vanishingly small cohort of the WAL stream, so they are filtered out with
a JVM-side predicate on the payload's first byte, collected to the
driver, decoded, and versioned by LSN. The resulting registry is a plain
picklable structure shipped to executors inside the decode UDF's closure
(cheaper than a broadcast for KB-sized data, and broadcast-equivalent).

Last-Relation-wins schema evolution (reader.py:222-243 parity): a
re-sent Relation message with a different column list produces a new
registry version; `diff()` turns consecutive versions into explicit
ADD/DROP/RETYPE actions that the lake table applies as schema updates.
"""

from __future__ import annotations

import bisect
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

from pypgoutput_spark.wal import codec


@dataclass(frozen=True)
class RelationVersion:
    relation_id: int
    lsn: int                      # LSN of the Relation frame that declared it
    version: int                  # 0-based, per relation, in LSN order
    namespace: str
    name: str
    replica_identity: str
    # (part_of_pkey, name, type_oid, atttypmod) per column, wire order
    columns: Tuple[Tuple[int, str, int, int], ...]

    @property
    def column_names(self) -> Tuple[str, ...]:
        return tuple(c[1] for c in self.columns)

    @property
    def key_columns(self) -> Tuple[str, ...]:
        return tuple(c[1] for c in self.columns if c[0] == 1)

    def spark_fields(self) -> List[Tuple[str, str]]:
        """[(name, spark_ddl_type)] for this version."""
        return [(c[1], codec.spark_type_for_oid(c[2], c[3])) for c in self.columns]


@dataclass
class SchemaAction:
    kind: str          # 'add' | 'drop' | 'retype'
    column: str
    spark_type: Optional[str] = None   # for add/retype


class RelationRegistry:
    """All relation versions seen in a frame stream, queryable by
    (relation_id, event LSN)."""

    def __init__(self) -> None:
        self._versions: Dict[int, List[RelationVersion]] = {}

    # -- construction --------------------------------------------------------

    def add_relation(self, lsn: int, decoded: dict) -> RelationVersion:
        """Register one decoded 'R' message (codec.decode_message shape)."""
        rid = decoded["relation_id"]
        cols = tuple(
            (c["part_of_pkey"], c["name"], c["type_id"], c["atttypmod"])
            for c in decoded["columns"]
        )
        versions = self._versions.setdefault(rid, [])
        if versions and versions[-1].columns == cols:
            return versions[-1]  # identical re-send (PG re-sends on reconnect)
        rv = RelationVersion(
            relation_id=rid,
            lsn=lsn,
            version=len(versions),
            namespace=decoded["namespace"],
            name=decoded["relation_name"],
            replica_identity=decoded["replica_identity"],
            columns=cols,
        )
        versions.append(rv)
        return rv

    def merge_frames(self, frames_df) -> int:
        """Merge a (micro-)batch's 'R' cohort into this registry in LSN
        order — the stream-driven schema-evolution hook (an R frame
        landing mid-stream re-versions its relation, last-Relation-wins,
        reference reader.py:222-243). Returns the number of R frames seen.

        With an ``mtype`` column (stamped at frame receipt) the filter is
        pushed to the parquet scan and the payload column is only
        materialized for matching rows; otherwise a JVM-side byte
        predicate over the payload. Only Relation frames (a handful per
        stream) ever reach Python or the driver.

        Protocol-v2: PG14+ with ``streaming = on`` sends the Relation
        message for a table FIRST touched by a streamed transaction
        INSIDE the stream chunk (mtype-stamped lowercase 'r' at capture;
        payload carries the subxid after the type byte). pgoutput's
        relation cache applies those immediately and keeps them even if
        the transaction later aborts — mirrored here by registering the
        stripped payload at its LSN like any other R. The payload-byte
        fallback predicate intentionally matches only v1 'R' frames:
        without mtype stamping an in-chunk R is indistinguishable from a
        v1 frame whose relation id happens to start 0x52 — v2 streams
        REQUIRE stamped frames (wal.generator FRAMES_SCHEMA contract).
        """
        from pyspark.sql import functions as F

        if "mtype" in frames_df.columns:
            r_frames = (
                frames_df.filter(F.col("mtype").isin("R", "r"))
                .select("lsn", "mtype", "payload").collect()
            )
        else:
            r_frames = (
                frames_df.filter(F.expr("substring(payload, 1, 1) = X'52'"))
                .selectExpr("lsn", "'R' AS mtype", "payload").collect()
            )
        for row in sorted(r_frames, key=lambda r: r["lsn"]):
            payload = bytes(row["payload"])
            if row["mtype"] == "r":
                _subxid, payload = codec.strip_stream_xid(payload)
            self.add_relation(row["lsn"], codec.decode_message(payload))
        return len(r_frames)

    def merge_rows(self, rows) -> int:
        """Merge pre-collected Relation frames (rows with ``lsn``,
        ``mtype``, ``payload``) — the driver-side twin of
        :meth:`merge_frames` for callers that already hold the R cohort
        from a fused lookup (streaming.pipeline.run_ingest collects the
        registry, truncate and 2PC cohorts in ONE job)."""
        for row in sorted(rows, key=lambda r: r["lsn"]):
            payload = bytes(row["payload"])
            if row["mtype"] == "r":
                _subxid, payload = codec.strip_stream_xid(payload)
            self.add_relation(row["lsn"], codec.decode_message(payload))
        return len(rows)

    @classmethod
    def from_frames(cls, frames_df) -> "RelationRegistry":
        """Extract and decode the 'R' cohort of a frames DataFrame."""
        reg = cls()
        reg.merge_frames(frames_df)
        return reg

    # -- lookup --------------------------------------------------------------

    def relation_ids(self) -> List[int]:
        return sorted(self._versions)

    def versions(self, relation_id: int) -> List[RelationVersion]:
        return list(self._versions.get(relation_id, []))

    def versions_in_range(self, relation_id: int, lo_lsn: int,
                          hi_lsn: int) -> List[RelationVersion]:
        """Versions LIVE for events in [lo_lsn, hi_lsn]: an event at L
        resolves to the last version with v.lsn <= L, so version i is
        live iff it starts at or before hi AND its successor (if any)
        starts after lo. Lets a micro-batch project only the schema
        versions its LSN span can actually contain — a batch wholly on
        one side of a DDL stays a single-projection (unstaged,
        single-pass) plan even though the global registry holds every
        version of the stream."""
        vs = self.versions(relation_id)
        out = []
        for i, v in enumerate(vs):
            nxt = vs[i + 1].lsn if i + 1 < len(vs) else None
            if v.lsn <= hi_lsn and (nxt is None or nxt > lo_lsn):
                out.append(v)
        return out

    def lookup(self, relation_id: int, lsn: int) -> Optional[RelationVersion]:
        """Version in effect for an event at ``lsn`` (last Relation frame at
        or before it — reader.py:222-224 last-wins parity)."""
        versions = self._versions.get(relation_id)
        if not versions:
            return None
        lsns = [v.lsn for v in versions]
        idx = bisect.bisect_right(lsns, lsn) - 1
        return versions[max(idx, 0)]

    def latest(self, relation_id: int) -> Optional[RelationVersion]:
        versions = self._versions.get(relation_id)
        return versions[-1] if versions else None

    # -- closure-shippable form ----------------------------------------------

    def to_plain(self) -> dict:
        """Picklable {relation_id: [(lsn, version, (names...), (pkeys...),
        (type_oids...))]} for the decode UDF closure. The oids element
        drives binary-mode ('b') TupleData cell conversion."""
        return {
            rid: [(v.lsn, v.version, v.column_names, tuple(c[0] for c in v.columns),
                   tuple(c[2] for c in v.columns))
                  for v in versions]
            for rid, versions in self._versions.items()
        }

    # -- evolution -----------------------------------------------------------

    @staticmethod
    def diff(old: RelationVersion, new: RelationVersion) -> List[SchemaAction]:
        """ADD/DROP/RETYPE actions turning ``old``'s schema into ``new``'s."""
        old_cols = {c[1]: c for c in old.columns}
        new_cols = {c[1]: c for c in new.columns}
        actions: List[SchemaAction] = []
        for name, col in new_cols.items():
            if name not in old_cols:
                actions.append(
                    SchemaAction("add", name, codec.spark_type_for_oid(col[2], col[3]))
                )
            elif (col[2], col[3]) != (old_cols[name][2], old_cols[name][3]):
                actions.append(
                    SchemaAction("retype", name, codec.spark_type_for_oid(col[2], col[3]))
                )
        for name in old_cols:
            if name not in new_cols:
                actions.append(SchemaAction("drop", name))
        return actions


def plain_lookup(plain: dict, relation_id: int, lsn: int):
    """lookup() over the closure-shipped plain form; used inside UDFs.

    Returns (version, column_names, pkey_flags, type_oids) or None.
    """
    versions = plain.get(relation_id)
    if not versions:
        return None
    v = versions[max(bisect.bisect_right([v[0] for v in versions], lsn) - 1, 0)]
    # legacy 4-tuples (no oids element) still resolve; binary-mode ('b')
    # cell conversion then fails loudly in the kernels, which need oids
    return v[1], v[2], v[3], (v[4] if len(v) > 4 else None)
