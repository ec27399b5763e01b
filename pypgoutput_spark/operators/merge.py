"""MERGE of an LWW-collapsed change set into a LakeTable.

The MERGE INTO analog (north rule): given one effective change per key
(output of :func:`pypgoutput_spark.operators.lww.lww_changes`), apply

    WHEN MATCHED AND final_op = 'D'  THEN DELETE
    WHEN MATCHED                     THEN UPDATE SET c = coalesce-with-target
    WHEN NOT MATCHED AND op <> 'D'   THEN INSERT

**Merge-on-read (default)** — the 100 TB shape: the change set is
bucketed by the table's key hash and APPENDED as per-bucket delta files
in one atomic snapshot commit. No target read, no join, no base
rewrite: merge cost ∝ change-set size regardless of table size (a
copy-on-write merge rewrites every *touched* bucket, and a uniformly
hashed change set touches ALL buckets — write amplification ∝ table
size). Readers resolve base ∪ deltas with the same associative
``max_by FILTER (carrier)`` aggregate the in-batch LWW uses — so the
column-level TOAST fallback ("NULL struct = keep the stored value")
that copy-on-write resolved with an inner join at write time resolves
by falling through to the base row at read time, with identical
semantics. Compaction (lake.table.LakeTable.compact) folds deltas into
the base when a bucket's delta/base byte ratio or delta-commit count
passes a bound, keeping read amplification bounded.

**Copy-on-write (``mode="cow"``)** is kept for read-heavy tables whose
batches touch few buckets: three broadcast-friendly joins (kept = target
LEFT ANTI changes; old = target INNER changes for the TOAST fallback;
upserts = changes LEFT OUTER old) rewrite only touched buckets —
deliberately *not* a full-outer join, which cannot broadcast.

Exactly-once (both modes): the batch's ``watermark_lsn`` commits
atomically with the data; re-applying a batch at or below the table
watermark is a no-op (idempotent replay — the distributed analog of the
reference's ``send_feedback(flush_lsn)`` ack, reference
reader.py:374-390).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import functions as F

from pypgoutput_spark.lake.table import LakeTable, _bucket_col


def _with_bucket(df, snap: dict):
    """Bucket by the MERGE's pinned snapshot (never the live CURRENT):
    the staged modulus must be the one the commit validates via
    ``expected_n_buckets`` — a rebucket racing the merge then conflicts
    instead of publishing deltas keyed by the wrong modulus."""
    return df.withColumn("_bucket", _bucket_col(snap["key_cols"], snap["n_buckets"]))


def _obs_get(obs) -> dict:
    """Observed metrics of the write job; a zero-task write (an empty
    batch, e.g. a truncate with no following inserts) never fires the
    observation — that IS zero rows, not an error."""
    try:
        return dict(obs.get)
    except Exception:  # noqa: BLE001 — no tasks ran
        return {"n": 0, "d": 0}


def merge_into(
    table: LakeTable,
    changes,
    watermark_lsn: int,
    truncate: bool = False,
    mode: str = "auto",
    broadcast_threshold: int = 150_000,
    auto_compact: bool = True,
    extra_metrics: Optional[dict] = None,
    repair: bool = False,
    bucketed: Optional[int] = None,
) -> dict:
    """Apply an LWW change set. Returns the batch metrics dict.

    ``changes`` columns: key cols, final_op, max_lsn, n_events, r_<c>
    structs per value column (NULL struct = keep target value).
    ``truncate``: the batch contained a Truncate — the merge replaces the
    table's full content with the post-truncate upserts.
    ``mode``: ``auto`` (initial load / truncate → single-pass base write;
    incremental → merge-on-read delta append), or ``cow`` to force the
    copy-on-write join+rewrite path for incremental batches.
    ``auto_compact``: ``True`` (default) schedules a triggered compaction
    on the table's maintenance thread — ingest latency never pays for
    the bucket rewrite (``metrics["compact_scheduled"]`` records the
    trigger; ``LakeTable.wait_maintenance`` joins it); ``"sync"`` runs
    it inline before returning; ``False`` leaves compaction entirely to
    an external maintenance job.
    ``bucketed``: the bucket modulus the caller staged under — it
    already cast the key columns to the table types, computed
    ``_bucket``, and the frame is HASH-PARTITIONED by it (the fused LWW
    collapse, operators.lww.lww_changes_flat with ``bucket_expr``) — so
    the merge skips its key cast and the write skips its repartition
    exchange. If a rebucket raced in (the head's modulus no longer
    matches), the fused layout is discarded and the normal
    re-bucket-under-head path runs; the commit's ``expected_n_buckets``
    guard then still sees staged-modulus == head-modulus.
    """
    snap = table.snapshot()
    if repair:
        # dead-letter repair (streaming.repair): the change set re-derives
        # rows ALREADY below the watermark, so the guard is bypassed and
        # the watermark stays put — a repair commit never acks new LSNs
        watermark_lsn = snap["watermark_lsn"]
        extra_metrics = {**(extra_metrics or {}), "repair": True}
    elif watermark_lsn <= snap["watermark_lsn"]:
        return {
            "skipped": True,
            "reason": "watermark",
            "watermark_lsn": snap["watermark_lsn"],
        }
    keys: Sequence[str] = snap["key_cols"]
    value_cols = [n for n, _ in snap["schema"] if n not in keys]

    # cast key columns to the table's declared key types BEFORE bucketing:
    # change-set keys arrive as wire text (pgoutput v1), and xxhash64 is
    # type-sensitive — a bigint-keyed table must bucket/join changes as
    # bigint or every match is missed
    col_types = dict(snap["schema"])
    pre_bucketed = bucketed is not None and int(bucketed) == snap["n_buckets"]
    if bucketed is not None and not pre_bucketed:
        changes = changes.drop("_bucket")  # staged under a raced-out modulus
    if not pre_bucketed:
        changes = changes.withColumns(
            {k: F.col(k).cast(col_types[k]) for k in keys}
        )

    if truncate or not (snap["buckets"] or snap.get("deltas")):
        # initial load / full replace: the target contributes nothing, so
        # the whole merge is ONE pass — no change-set cache, no joins;
        # op counts ride the same write job via observed metrics
        from pyspark.sql import Observation

        obs = Observation()
        observed = changes.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("final_op") == "D", 1)).alias("d"),
        )
        resolved = observed.filter(F.col("final_op") != "D").select(
            *(["_bucket"] if pre_bucketed else []),
            *keys,
            *[F.col(f"r_{c}.v").cast(col_types[c]).alias(c) for c in value_cols],
        )
        staged, dbytes = table.write_buckets(
            resolved if pre_bucketed else _with_bucket(resolved, snap),
            snap["version"] + 1, pre_partitioned=pre_bucketed,
        )
        got = _obs_get(obs)
        metrics = {
            "upserts": int(got["n"] - got["d"]),
            "deletes": int(got["d"]),
            "change_keys": int(got["n"]),
            "buckets_touched": len(staged),
            "truncated": truncate,
            "mode": "replace",
            **(extra_metrics or {}),
        }
        version = table.commit(
            staged,
            replaced_buckets=[int(b) for b in snap["buckets"]],
            watermark_lsn=watermark_lsn,
            metrics=metrics,
            truncate=truncate,
            dir_bytes=dbytes,
            expected_n_buckets=snap["n_buckets"],
        )
        metrics["version"] = version
        metrics["skipped"] = False
        return metrics

    if mode == "cow":
        return _merge_cow(
            table, changes, watermark_lsn, snap, keys, value_cols, col_types,
            broadcast_threshold, extra_metrics,
        )

    # ---- merge-on-read (default incremental path) -----------------------
    # one Spark job: bucket the LWW change set and append it as per-bucket
    # delta files; op counts ride the write job as observed metrics
    from pyspark.sql import Observation

    obs = Observation()
    observed = changes.observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("final_op") == "D", 1)).alias("d"),
    )
    delta = observed.select(
        *(["_bucket"] if pre_bucketed else []),
        *keys, "final_op", "max_lsn",
        *[F.col(f"r_{c}").alias(f"r_{c}") for c in value_cols],
    )
    staged, dbytes = table.write_buckets(
        delta if pre_bucketed else _with_bucket(delta, snap),
        snap["version"] + 1, pre_partitioned=pre_bucketed,
    )
    got = _obs_get(obs)
    n_changes = int(got["n"])
    metrics = {
        "upserts": int(got["n"] - got["d"]),
        "deletes": int(got["d"]),
        "change_keys": n_changes,
        "buckets_touched": len(staged),
        "truncated": False,
        "mode": "mor",
        **(extra_metrics or {}),
    }
    version = table.commit(
        {}, [], watermark_lsn=watermark_lsn, metrics=metrics,
        delta_buckets=staged, dir_bytes=dbytes,
        expected_n_buckets=snap["n_buckets"],
    )
    metrics["version"] = version
    metrics["skipped"] = False
    if auto_compact and staged:
        due = table.buckets_to_compact()
        if due:
            if auto_compact == "sync":
                cv = table.compact(due)
                if cv is not None:
                    metrics["compacted_buckets"] = due
                    metrics["version"] = cv
            else:
                # async-compactor analog: the rewrite runs on the table's
                # maintenance thread; this batch's latency is unaffected
                table.schedule_compact(due)
                metrics["compact_scheduled"] = due
    return metrics


def _merge_cow(
    table: LakeTable, changes, watermark_lsn: int, snap: dict,
    keys: Sequence[str], value_cols, col_types: dict,
    broadcast_threshold: int, extra_metrics: Optional[dict],
) -> dict:
    """Copy-on-write incremental merge: join + rewrite of touched buckets
    (reads resolve any outstanding deltas, so the rewritten base is
    fully resolved and the commit clears those buckets' deltas)."""
    ch = _with_bucket(changes, snap)
    ch.cache()
    try:
        # one driver action: touched buckets + per-op counts (also
        # materializes the change-set cache)
        bucket_ops = ch.groupBy("_bucket", "final_op").agg(F.count("*").alias("cnt")).collect()
        op_counts: dict = {}
        touched_set = set()
        for r in bucket_ops:
            op_counts[r["final_op"]] = op_counts.get(r["final_op"], 0) + r["cnt"]
            touched_set.add(int(r["_bucket"]))
        touched = sorted(touched_set)
        n_changes = sum(op_counts.values())

        if n_changes == 0:
            # nothing to apply for this table in this batch (common in
            # multi-relation routing): advance the watermark with a
            # metadata-only commit — no scan, no write job
            metrics = {
                "upserts": 0, "deletes": 0, "change_keys": 0,
                "buckets_touched": 0, "truncated": False, "mode": "cow",
                **(extra_metrics or {}),
            }
            version = table.commit(
                {}, [], watermark_lsn=watermark_lsn, metrics=metrics
            )
            metrics["version"] = version
            metrics["skipped"] = False
            return metrics

        small = n_changes <= broadcast_threshold
        b = (lambda df: F.broadcast(df)) if small else (lambda df: df)

        target = table.read(buckets=touched)

        kept = target.join(b(ch.select(*keys)), on=list(keys), how="left_anti")

        old = target.join(
            b(ch.filter(F.col("final_op") != "D").select(*keys)),
            on=list(keys),
            how="inner",
        ).select(*keys, *[F.col(c).alias(f"_old_{c}") for c in value_cols])

        ups = ch.filter(F.col("final_op") != "D").join(
            b(old) if small else old, on=list(keys), how="left"
        )
        # resolve each column (in-batch value, else target's old value) and
        # cast to the table's declared type — wire values are text
        # (pgoutput v1), the table schema may have evolved typed columns
        resolved = ups.select(
            *keys,
            *[
                F.when(F.col(f"r_{c}").isNotNull(), F.col(f"r_{c}.v").cast(col_types[c]))
                .otherwise(F.col(f"_old_{c}"))
                .alias(c)
                for c in value_cols
            ],
        )

        result = kept.unionByName(resolved)
        staged, dbytes = table.write_buckets(
            _with_bucket(result, snap), snap["version"] + 1
        )
        # change-feed sidecar: the rewritten buckets mix changed and
        # carried rows, so the feed comes from the LWW change set itself
        # (delta format, feed-only — Delta CDF `_change_data` analog);
        # costs one extra write of change-set size, never table size
        cdf_staged, cdf_bytes = table.write_buckets(
            ch.select(
                *keys, "final_op", "max_lsn",
                *[f"r_{c}" for c in value_cols], "_bucket",
            ),
            snap["version"] + 1,
        )
        dbytes = {**dbytes, **cdf_bytes}
        metrics = {
            "upserts": int(op_counts.get("I", 0) + op_counts.get("U", 0)),
            "deletes": int(op_counts.get("D", 0)),
            "change_keys": int(n_changes),
            "buckets_touched": len(touched),
            "truncated": False,
            "mode": "cow",
            "broadcast": small,
            **(extra_metrics or {}),
        }
        version = table.commit(
            staged,
            replaced_buckets=touched,
            watermark_lsn=watermark_lsn,
            metrics=metrics,
            dir_bytes=dbytes,
            cdf_buckets=cdf_staged,
            expected_n_buckets=snap["n_buckets"],
        )
        metrics["version"] = version
        metrics["skipped"] = False
        return metrics
    finally:
        ch.unpersist()
