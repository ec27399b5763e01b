"""The vectorized decode stage: binary WAL frames → typed change events.

Spark-first re-expression of the reference's serial transform pipeline
(reference reader.py:174-331 ``transform_raw``): instead of one Python
generator pulling one message at a time through a pipe, the frame
DataFrame is hash-partitioned by WAL segment, sorted by LSN within
partitions, and decoded by an Arrow-batched ``mapInPandas`` kernel.

Transaction scoping (reference reader.py:182-193): Begin/Commit markers
open/close a transaction whose (xid, begin_lsn, commit_ts) is stamped on
every contained event. Because a segment's frames are contiguous within
one partition and sorted by LSN, the kernel carries open-transaction
state across Arrow batches with a per-segment dict — exact semantics,
zero shuffle beyond the single segment repartition (which also gives the
decode its parallelism unit: ~one task per WAL segment).

Scale notes:
  - decode parallelism = number of segments; segments are sized by the
    source (frames per segment ≈ frames_per_task), so a 1000-executor
    cluster sees 1000s of independent decode tasks.
  - only I/U/D/T events are emitted; B/C/R/O/Y frames are consumed inside
    the kernel (R additionally flows to the driver-side registry via a
    JVM byte-predicate filter — see plans.registry).
  - output carries cells as MAP<STRING,STRING> keyed by column name plus
    the TOAST-unchanged column list, so downstream operators never need
    positional knowledge (the positional zip of reference reader.py:63-69
    happens here, vectorized, against the registry version in effect at
    the event's LSN).
"""

from __future__ import annotations

from typing import Iterator, List, Optional

from pypgoutput_spark.plans.registry import RelationRegistry, plain_lookup
from pypgoutput_spark.wal import codec

#: canonical decoded change-event schema (SURVEY.md §1.1 ChangeEvent)
EVENTS_SCHEMA = (
    "lsn BIGINT, op STRING, relation_id INT, xid BIGINT, begin_lsn BIGINT, "
    "commit_ts_us BIGINT, schema_version INT, before_kind STRING, "
    "before MAP<STRING,STRING>, after MAP<STRING,STRING>, "
    "after_unchanged ARRAY<STRING>, segment BIGINT"
)


def _zip_cells(names, cats, vals):
    """Positional cells → (name→value map, unchanged-column list).

    NULL ('n') cells map to None values; TOAST ('u') cells also map to
    None but are listed in ``unchanged`` — the distinction the reference
    erases (reader.py:63-69) and the merge needs (SURVEY.md §7).
    """
    m = {}
    unchanged: List[str] = []
    for name, cat, val in zip(names, cats, vals):
        m[name] = val
        if cat == "u":
            unchanged.append(name)
    return m, unchanged


def _split(cells):
    return [c for c, _ in cells], [v for _, v in cells]


def _make_kernel(registry_plain: dict, strict: bool = True):
    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        open_tx: dict = {}  # segment -> (xid, begin_lsn, commit_ts_us)
        for pdf in batches:
            out = {k: [] for k in (
                "lsn", "op", "relation_id", "xid", "begin_lsn", "commit_ts_us",
                "schema_version", "before_kind", "before", "after",
                "after_unchanged", "segment",
            )}

            def emit(lsn, op, rid, seg, schema_version, before_kind=None,
                     before=None, after=None, after_unchanged=None):
                tx = open_tx.get(seg)
                out["lsn"].append(lsn)
                out["op"].append(op)
                out["relation_id"].append(rid)
                out["xid"].append(tx[0] if tx else None)
                out["begin_lsn"].append(tx[1] if tx else None)
                out["commit_ts_us"].append(tx[2] if tx else None)
                out["schema_version"].append(schema_version)
                out["before_kind"].append(before_kind)
                out["before"].append(before)
                out["after"].append(after)
                out["after_unchanged"].append(after_unchanged)
                out["segment"].append(seg)

            for seg, lsn, payload in zip(
                pdf["segment"].values, pdf["lsn"].values, pdf["payload"].values
            ):
                seg = int(seg)
                lsn = int(lsn)
                m = codec.decode_message(bytes(payload))
                t = m["msg_type"]
                if t == "B":
                    open_tx[seg] = (m["xid"], lsn, m["commit_ts_us"])
                    continue
                if t == "C":
                    open_tx.pop(seg, None)
                    continue
                if t in ("R", "O", "Y"):
                    continue  # registry handled driver-side; O/Y ignored (reference parity)
                if t == "T":
                    for rid in m["relation_ids"]:
                        looked = plain_lookup(registry_plain, rid, lsn)
                        emit(lsn, "T", rid, seg,
                             looked[0] if looked else None)
                    continue
                rid = m["relation_id"]
                looked = plain_lookup(registry_plain, rid, lsn)
                if looked is None:
                    if strict:
                        raise ValueError(
                            f"no Relation message seen for relation_id={rid} "
                            f"at lsn={lsn} (stream must carry 'R' before DML)"
                        )
                    continue
                version, names, _pkeys = looked
                if t == "I":
                    after, unch = _zip_cells(names, *_split(m["new"]))
                    emit(lsn, "I", rid, seg, version, None, None, after, unch)
                elif t == "U":
                    before = None
                    if m["old"] is not None:
                        before, _ = _zip_cells(names, *_split(m["old"]))
                    after, unch = _zip_cells(names, *_split(m["new"]))
                    emit(lsn, "U", rid, seg, version, m["old_kind"], before, after, unch)
                elif t == "D":
                    before, _ = _zip_cells(names, *_split(m["old"]))
                    emit(lsn, "D", rid, seg, version, m["old_kind"], before, None, None)
            if out["lsn"]:  # empty pandas frames break Arrow map-type inference
                yield pd.DataFrame(out)

    return kernel


def decode_frames(frames_df, registry: Optional[RelationRegistry] = None,
                  strict: bool = True):
    """frames (segment, lsn, payload) → canonical change events.

    One shuffle: repartition by segment so each transaction's frames are
    co-located and LSN-sorted for exact B..C transaction stamping.
    """
    from pyspark.sql import functions as F

    if registry is None:
        registry = RelationRegistry.from_frames(frames_df)
    plain = registry.to_plain()
    partitioned = frames_df.repartition("segment").sortWithinPartitions("segment", "lsn")
    events = partitioned.mapInPandas(_make_kernel(plain, strict), schema=EVENTS_SCHEMA)
    return events.withColumn(
        "commit_ts",
        F.timestamp_micros(F.col("commit_ts_us") + F.lit(codec.PG_EPOCH_UNIX_US)),
    )
