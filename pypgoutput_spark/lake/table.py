"""LakeTable: a minimal snapshot-versioned, hash-bucketed, merge-on-read
lake table.

The north rule targets Iceberg ``MERGE INTO``; this sandbox ships no
Iceberg/Delta jars, so the same design is implemented directly on parquet
with the properties the rule actually needs:

  - **Hash-bucket layout**: rows are bucketed by
    ``pmod(xxhash64(key_cols), n_buckets)`` (Iceberg ``bucket(N, key)``
    analog). Every file belongs to exactly one bucket, so key-scoped
    reads and merges prune at the file level.
  - **Merge-on-read deltas** (the 100 TB write path): an incremental
    merge APPENDS the batch's LWW-collapsed change set as per-bucket
    *delta* files — write cost ∝ change-set size, never ∝ table size.
    Readers resolve base ∪ deltas with the same associative
    ``max_by(..., lsn) FILTER (carrier)`` aggregate the in-batch LWW
    uses (operators/lww.py): base rows participate at ``lsn = -1``, so a
    column with no delta information falls through to the stored value —
    TOAST-'u' preservation and delete-reset semantics hold across
    commits exactly as they do within a batch. Buckets with no deltas
    are read as plain scans (no aggregate, no shuffle); only dirty
    buckets pay resolution, and compaction keeps that fraction bounded.
  - **Compaction**: when a bucket's delta bytes pass a ratio of its base
    (or its delta-commit count passes a bound), the bucket is rewritten
    as resolved base and its deltas dropped — an independent, idempotent
    commit that never gates ingest (the async-compactor analog; here it
    runs synchronously after the delta commit when triggered).
  - **Atomic snapshot commits**: a snapshot JSON lists, per bucket, the
    base and delta directories that constitute it, plus the schema and
    the ``watermark_lsn``. Publishing = atomic rename of the CURRENT
    pointer. Readers resolve CURRENT → snapshot → exact file set; a
    crashed writer leaves only unreferenced staging files (never a torn
    table).
  - **Exactly-once**: ``watermark_lsn`` (the applied-through LSN, the
    analog of the reference's ``send_feedback(flush_lsn)`` ack protocol,
    reference reader.py:374-390) commits in the *same* atomic snapshot as
    the data. Replaying a batch whose max LSN ≤ watermark is a no-op.
  - **Schema evolution**: snapshots carry the schema; adds/drops are
    metadata-only (old files are read through the current schema — parquet
    fills missing columns with NULL and prunes dropped ones); retypes
    rewrite (rare DDL).
  - **Lineage/metrics**: every snapshot embeds the batch's applied /
    deleted / skipped counters and per-bucket file provenance, plus
    per-bucket byte accounting (``bucket_bytes`` / ``delta_bytes``) so
    the compaction policy never re-lists the filesystem.

At 100 TB scale, ``n_buckets`` is sized so a bucket ≈ a few GB; the
listing in a snapshot stays in the thousands of entries, deltas shuffle
only change-set bytes, and resolution touches only dirty buckets.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
import uuid
from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import functions as F

CURRENT = "CURRENT"


def _bucket_col(key_cols: Sequence[str], n_buckets: int):
    return F.pmod(F.xxhash64(*[F.col(k) for k in key_cols]), F.lit(n_buckets))


def _du(dirs: Sequence[str]) -> int:
    total = 0
    for d in dirs:
        for root, _dirs, files in os.walk(d):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:  # pragma: no cover
                    pass
    return total


class LakeTable:
    def __init__(self, spark, path: str):
        self.spark = spark
        self.path = path.rstrip("/")
        self.meta_dir = os.path.join(self.path, "_meta")
        self.snap_dir = os.path.join(self.meta_dir, "snapshots")
        if not os.path.exists(os.path.join(self.meta_dir, CURRENT)):
            raise FileNotFoundError(f"not a LakeTable (no _meta/CURRENT): {path}")

    # ------------------------------------------------------------------ setup

    @classmethod
    def create(
        cls,
        spark,
        path: str,
        schema: Sequence[Tuple[str, str]],
        key_cols: Sequence[str],
        n_buckets: int = 16,
        props: Optional[dict] = None,
    ) -> "LakeTable":
        """Create an empty table. ``schema``: [(col_name, spark_ddl_type)]."""
        path = path.rstrip("/")
        os.makedirs(os.path.join(path, "_meta", "snapshots"), exist_ok=True)
        os.makedirs(os.path.join(path, "data"), exist_ok=True)
        snap = {
            "version": 0,
            "schema": [list(c) for c in schema],
            "key_cols": list(key_cols),
            "n_buckets": n_buckets,
            "buckets": {},
            "deltas": {},
            "bucket_bytes": {},
            "delta_bytes": {},
            "watermark_lsn": -1,
            "parent": None,
            "props": props or {},
            "metrics": {},
            "created_at": time.time(),
        }
        _write_json(os.path.join(path, "_meta", "snapshots", "v00000000.json"), snap)
        _atomic_write(os.path.join(path, "_meta", CURRENT), "0")
        return cls(spark, path)

    # ------------------------------------------------------------- snapshots

    def current_version(self) -> int:
        with open(os.path.join(self.meta_dir, CURRENT)) as f:
            return int(f.read().strip())

    def snapshot(self, version: Optional[int] = None) -> dict:
        v = self.current_version() if version is None else version
        with open(os.path.join(self.snap_dir, f"v{v:08d}.json")) as f:
            return json.load(f)

    def history(self) -> List[dict]:
        out = []
        for name in sorted(os.listdir(self.snap_dir)):
            with open(os.path.join(self.snap_dir, name)) as f:
                out.append(json.load(f))
        return out

    @property
    def watermark_lsn(self) -> int:
        return self.snapshot()["watermark_lsn"]

    def schema_ddl(self, snap: Optional[dict] = None) -> str:
        snap = snap or self.snapshot()
        return ", ".join(f"`{n}` {t}" for n, t in snap["schema"])

    def delta_schema_ddl(self, snap: Optional[dict] = None) -> str:
        """Schema of delta files: typed keys + final_op + max_lsn + one
        ``r_<col> STRUCT<v: STRING>`` per value column (NULL struct =
        no information, fall through to older deltas / base)."""
        snap = snap or self.snapshot()
        keys = snap["key_cols"]
        parts = [f"`{n}` {t}" for n, t in snap["schema"] if n in keys]
        parts += ["final_op STRING", "max_lsn BIGINT"]
        parts += [
            f"`r_{n}` STRUCT<v: STRING>" for n, _ in snap["schema"] if n not in keys
        ]
        return ", ".join(parts)

    # ------------------------------------------------------------------ read

    def read(self, version: Optional[int] = None, buckets: Optional[Sequence[int]] = None):
        """DataFrame of the table state at a snapshot (default: current).

        Buckets without deltas are plain scans. Dirty buckets resolve
        base ∪ deltas with the LWW read aggregate (see module
        docstring); ``buckets`` restricts the scan (file-level pruning).
        """
        snap = self.snapshot(version)
        base: Dict[str, List[str]] = snap["buckets"]
        deltas: Dict[str, List[str]] = snap.get("deltas", {})
        if buckets is not None:
            keep = {str(b) for b in buckets}
            base = {b: dd for b, dd in base.items() if b in keep}
            deltas = {b: dd for b, dd in deltas.items() if b in keep}
        ddl = self.schema_ddl(snap)
        clean_dirs = [d for b, dd in base.items() if b not in deltas for d in dd]
        dirty_base_dirs = [d for b in deltas for d in base.get(b, [])]
        delta_dirs = [d for dd in deltas.values() for d in dd]
        parts = []
        if clean_dirs:
            # explicit schema: evolution-safe (missing columns → NULL,
            # dropped columns pruned at the parquet reader)
            parts.append(self.spark.read.schema(ddl).parquet(*clean_dirs))
        if delta_dirs:
            parts.append(self._resolve(snap, dirty_base_dirs, delta_dirs))
        if not parts:
            return self.spark.createDataFrame([], schema=ddl)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _resolve(self, snap: dict, base_dirs: List[str], delta_dirs: List[str]):
        """LWW-resolve dirty buckets: base rows at lsn=-1 ∪ delta rows at
        their commit max_lsn; per column, the newest row that *carries*
        information wins (a delta with a value, a D reset, or the base);
        keys whose newest row is a D drop out. The aggregate is
        associative (partial map-side combine), and base/delta files of
        one bucket are co-bucketed, so at scale the exchange moves only
        dirty-bucket rows."""
        keys = snap["key_cols"]
        col_types = dict(snap["schema"])
        value_cols = [n for n, _ in snap["schema"] if n not in keys]
        ddl = self.schema_ddl(snap)

        sel_base = [f"`{k}`" for k in keys] + ["'B' AS __op", "CAST(-1 AS BIGINT) AS __lsn"]
        sel_base += [f"`{c}` AS `__v_{c}`" for c in value_cols]
        sel_base += [f"true AS `__has_{c}`" for c in value_cols]
        if base_dirs:
            base = self.spark.read.schema(ddl).parquet(*base_dirs).selectExpr(*sel_base)
        else:
            base = None

        delta_raw = self.spark.read.schema(self.delta_schema_ddl(snap)).parquet(*delta_dirs)
        sel_delta = [f"`{k}`" for k in keys] + ["final_op AS __op", "max_lsn AS __lsn"]
        sel_delta += [
            f"CASE WHEN final_op = 'D' THEN CAST(NULL AS {col_types[c]}) "
            f"ELSE CAST(`r_{c}`.v AS {col_types[c]}) END AS `__v_{c}`"
            for c in value_cols
        ]
        sel_delta += [
            f"(final_op = 'D' OR `r_{c}` IS NOT NULL) AS `__has_{c}`"
            for c in value_cols
        ]
        delta = delta_raw.selectExpr(*sel_delta)
        allrows = delta if base is None else base.unionByName(delta)

        aggs = ["max_by(__op, __lsn) AS __final_op"] + [
            f"max_by(`__v_{c}`, __lsn) FILTER (WHERE `__has_{c}`) AS `{c}`"
            for c in value_cols
        ]
        resolved = (
            allrows.groupBy(*[F.col(k) for k in keys])
            .agg(*[F.expr(a) for a in aggs])
            .filter("__final_op <> 'D'")
        )
        return resolved.select(*[F.col(n) for n, _ in snap["schema"]])

    # ----------------------------------------------------------------- write

    def _stage_dir(self, version: int) -> str:
        return os.path.join(self.path, "data", f"commit-{version:08d}-{uuid.uuid4().hex[:8]}")

    def write_buckets(self, df, version: int) -> Dict[str, List[str]]:
        """Write rows (must carry ``_bucket``) as one directory per bucket;
        returns {bucket: [dir]} for the snapshot.

        One shuffle co-locates each bucket's rows (one file per bucket,
        not #partitions × #buckets fragments); the dynamic-partition
        writer does its own local sort on ``_bucket`` — an explicit
        key sort here would only burn CPU (no key-range pruning exists
        on read).
        """
        stage = self._stage_dir(version)
        (
            df.repartition(F.col("_bucket"))
            .write.partitionBy("_bucket")
            .parquet(stage)
        )
        out: Dict[str, List[str]] = {}
        if os.path.exists(stage):
            for name in os.listdir(stage):
                if name.startswith("_bucket="):
                    out[name.split("=", 1)[1]] = [os.path.join(stage, name)]
        return out

    def commit(
        self,
        new_buckets: Dict[str, List[str]],
        replaced_buckets: Sequence[int],
        watermark_lsn: Optional[int] = None,
        metrics: Optional[dict] = None,
        schema: Optional[Sequence[Tuple[str, str]]] = None,
        truncate: bool = False,
        delta_buckets: Optional[Dict[str, List[str]]] = None,
    ) -> int:
        """Publish a new snapshot.

        ``new_buckets`` replace the base of the buckets they name;
        ``replaced_buckets`` have their base dropped and their deltas
        cleared (a replaced base is fully resolved — COW rewrite or
        compaction); ``delta_buckets`` APPEND merge-on-read delta dirs;
        ``truncate`` drops everything first. Untouched buckets carry over.
        """
        prev = self.snapshot()
        version = prev["version"] + 1
        if truncate:
            buckets: Dict[str, List[str]] = {}
            deltas: Dict[str, List[str]] = {}
            bucket_bytes: Dict[str, int] = {}
            delta_bytes: Dict[str, int] = {}
        else:
            buckets = dict(prev["buckets"])
            deltas = {b: list(dd) for b, dd in prev.get("deltas", {}).items()}
            bucket_bytes = dict(prev.get("bucket_bytes", {}))
            delta_bytes = dict(prev.get("delta_bytes", {}))
        for b in replaced_buckets:
            buckets.pop(str(b), None)
            deltas.pop(str(b), None)
            bucket_bytes.pop(str(b), None)
            delta_bytes.pop(str(b), None)
        for b, dirs in new_buckets.items():
            buckets[str(b)] = dirs
            deltas.pop(str(b), None)
            bucket_bytes[str(b)] = _du(dirs)
            delta_bytes.pop(str(b), None)
        for b, dirs in (delta_buckets or {}).items():
            deltas.setdefault(str(b), []).extend(dirs)
            delta_bytes[str(b)] = delta_bytes.get(str(b), 0) + _du(dirs)
        snap = {
            "version": version,
            "schema": [list(c) for c in (schema or prev["schema"])],
            "key_cols": prev["key_cols"],
            "n_buckets": prev["n_buckets"],
            "buckets": buckets,
            "deltas": deltas,
            "bucket_bytes": bucket_bytes,
            "delta_bytes": delta_bytes,
            "watermark_lsn": prev["watermark_lsn"] if watermark_lsn is None else watermark_lsn,
            "parent": prev["version"],
            "props": prev["props"],
            "metrics": metrics or {},
            "created_at": time.time(),
        }
        _write_json(os.path.join(self.snap_dir, f"v{version:08d}.json"), snap)
        _atomic_write(os.path.join(self.meta_dir, CURRENT), str(version))
        return version

    # ------------------------------------------------------------ compaction

    def buckets_to_compact(
        self,
        compact_ratio: float = 0.25,
        min_compact_bytes: int = 8 << 20,
        max_delta_commits: int = 32,
    ) -> List[int]:
        """Buckets whose deltas warrant folding into the base: delta bytes
        pass ``compact_ratio`` of base AND an absolute floor (tiny deltas
        never trigger a base rewrite), OR the delta-commit count passes
        ``max_delta_commits`` (bounds snapshot listing growth)."""
        snap = self.snapshot()
        out = []
        for b, dirs in snap.get("deltas", {}).items():
            dbytes = snap.get("delta_bytes", {}).get(b, 0)
            bbytes = snap.get("bucket_bytes", {}).get(b, 0)
            if (dbytes > max(compact_ratio * bbytes, min_compact_bytes)
                    or len(dirs) > max_delta_commits):
                out.append(int(b))
        return sorted(out)

    def compact(self, buckets: Optional[Sequence[int]] = None,
                extra_metrics: Optional[dict] = None) -> Optional[int]:
        """Rewrite the given dirty buckets (default: all dirty) as resolved
        base and drop their deltas. Idempotent and watermark-neutral — a
        crash leaves only unreferenced staging files."""
        snap = self.snapshot()
        dirty = [int(b) for b in snap.get("deltas", {})]
        if buckets is not None:
            want = set(int(b) for b in buckets)
            dirty = [b for b in dirty if b in want]
        if not dirty:
            return None
        resolved = self.read(buckets=dirty)
        staged = self.write_buckets(self.with_bucket(resolved), snap["version"] + 1)
        # carry forward checkpoint state the ingest pipeline persists in the
        # batch commit's metrics (open-transaction carry) — compaction is
        # watermark-neutral and must be checkpoint-neutral too
        carried = {
            k: snap["metrics"][k] for k in ("open_tx",) if k in snap.get("metrics", {})
        }
        metrics = {"compaction": {"buckets": dirty}, **carried, **(extra_metrics or {})}
        return self.commit(staged, replaced_buckets=dirty, metrics=metrics)

    # ------------------------------------------------------- change data feed

    def delta_dirs_added(self, version: int) -> Dict[str, List[str]]:
        """Per-bucket delta directories first referenced at ``version``
        (snapshot delta lists are cumulative; the diff against the parent
        is exactly the batch's appended change set)."""
        snap = self.snapshot(version)
        parent = snap.get("parent")
        prev = self.snapshot(parent) if parent is not None else {"deltas": {}}
        out: Dict[str, List[str]] = {}
        for b, dirs in snap.get("deltas", {}).items():
            seen = set(prev.get("deltas", {}).get(b, []))
            added = [d for d in dirs if d not in seen]
            if added:
                out[b] = added
        return out

    def changes(self, since_version: int, until_version: Optional[int] = None):
        """Change-data-feed read: the row-level changes committed in
        ``(since_version, until_version]`` — CDC in, CDF out, so
        downstream consumers ingest incrementally instead of re-scanning
        the table (Delta CDF / Iceberg changelog analog).

        Columns: key cols, ``final_op`` ('I'/'U' upsert, 'D' delete),
        ``max_lsn``, ``_commit_version``, and per value column the new
        value plus ``upd_<col>`` (False = the commit carried no
        information for that column — e.g. an unchanged TOAST cell — so
        the prior value still stands; for 'D' rows values are NULL).

        Covered commits: merge-on-read delta commits (exact change set,
        zero extra cost — the delta files ARE the feed), truncates and
        initial loads (every row of the new base as an upsert at the
        commit watermark). Compaction / metadata-only commits contribute
        no rows. Copy-on-write incremental commits are not
        change-tracked (the rewritten bucket mixes changed and carried
        rows) and raise — ingest with the default ``mode='mor'`` to get
        a feed.
        """
        until = self.current_version() if until_version is None else until_version
        snap = self.snapshot(until)
        keys = snap["key_cols"]
        col_types = dict(snap["schema"])
        value_cols = [n for n, _ in snap["schema"] if n not in keys]

        def _flatten_delta(df, version: int):
            sel = [f"`{k}`" for k in keys] + ["final_op", "max_lsn"]
            sel += [
                f"CASE WHEN final_op = 'D' THEN CAST(NULL AS {col_types[c]}) "
                f"ELSE CAST(`r_{c}`.v AS {col_types[c]}) END AS `{c}`"
                for c in value_cols
            ]
            sel += [f"(`r_{c}` IS NOT NULL) AS `upd_{c}`" for c in value_cols]
            return df.selectExpr(*sel).withColumn("_commit_version", F.lit(version))

        parts = []
        for v in range(since_version + 1, until + 1):
            try:
                s = self.snapshot(v)
                added = self.delta_dirs_added(v)
            except FileNotFoundError as exc:
                raise ValueError(
                    f"change feed needs snapshots ({since_version}, {until}] but "
                    f"version {v} (or its parent) is expired — retain enough "
                    "history (expire_snapshots keep_last) for the slowest consumer"
                ) from exc
            if added:
                dirs = [d for dd in added.values() for d in dd]
                parts.append(
                    _flatten_delta(
                        self.spark.read.schema(self.delta_schema_ddl(s)).parquet(*dirs), v
                    )
                )
                continue
            parent = s.get("parent")
            prev = self.snapshot(parent) if parent is not None else {"buckets": {}}
            new_base = {
                b: dirs for b, dirs in s["buckets"].items()
                if dirs != prev.get("buckets", {}).get(b)
            }
            if not new_base:
                continue  # metadata-only commit (watermark / schema add-drop)
            if "compaction" in s.get("metrics", {}):
                continue  # rewrite of already-fed changes
            if not (s.get("metrics", {}).get("truncated") or not prev.get("buckets")):
                raise ValueError(
                    f"version {v} rewrote base buckets outside truncate/initial-load "
                    "(copy-on-write merge?) — not change-tracked; ingest with "
                    "mode='mor' for a change feed"
                )
            base = self.spark.read.schema(self.schema_ddl(s)).parquet(
                *[d for dd in new_base.values() for d in dd]
            )
            sel = [f"`{k}`" for k in keys]
            sel += ["'U' AS final_op", f"CAST({s['watermark_lsn']} AS BIGINT) AS max_lsn"]
            sel += [f"`{c}`" for c in value_cols]
            sel += [f"true AS `upd_{c}`" for c in value_cols]
            parts.append(base.selectExpr(*sel).withColumn("_commit_version", F.lit(v)))
        if not parts:
            ddl = ", ".join(
                [f"`{n}` {t}" for n, t in snap["schema"] if n in keys]
                + ["final_op STRING", "max_lsn BIGINT"]
                + [f"`{n}` {t}" for n, t in snap["schema"] if n not in keys]
                + [f"`upd_{n}` BOOLEAN" for n, _ in snap["schema"] if n not in keys]
                + ["`_commit_version` INT"]
            )
            return self.spark.createDataFrame([], schema=ddl)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # ------------------------------------------------------------ maintenance

    def expire_snapshots(
        self, keep_last: int = 10, orphan_grace_sec: float = 3600.0
    ) -> dict:
        """Expire old snapshots and garbage-collect unreferenced data
        directories (Iceberg ``expireSnapshots`` + orphan-file cleanup).

        Keeps the newest ``keep_last`` snapshots (time travel over those
        is preserved; older versions stop being readable). Data dirs are
        deleted only when referenced by NO kept snapshot; a dir
        referenced by nothing at all (a crashed writer's staging) is
        deleted only once older than ``orphan_grace_sec`` so a
        concurrent in-flight commit is never clobbered. Without
        expiration, every MOR delta and COW rewrite accumulates forever
        — at 100 TB this is the difference between bounded and unbounded
        storage.

        Returns {"expired": [versions], "deleted_dirs": n, "freed_bytes": n}.
        """
        import shutil

        current = self.current_version()
        cutoff = current - keep_last + 1
        all_versions = sorted(
            int(name[1:9]) for name in os.listdir(self.snap_dir)
            if name.startswith("v") and name.endswith(".json")
        )
        keep = [v for v in all_versions if v >= cutoff or v == current]
        expired = [v for v in all_versions if v not in keep]
        # the orphan sweep below runs even with nothing to expire — a
        # vacuum call after a crashed writer must still reclaim staging

        def _refs(versions) -> set:
            out = set()
            for v in versions:
                s = self.snapshot(v)
                for dd in s["buckets"].values():
                    out.update(os.path.normpath(d) for d in dd)
                for dd in s.get("deltas", {}).values():
                    out.update(os.path.normpath(d) for d in dd)
            return out

        kept_refs = _refs(keep)
        expired_refs = _refs(expired) - kept_refs
        # walk data/commit-*/ at bucket-dir granularity (the unit snapshots
        # reference); an unreferenced bucket dir outside any expired
        # snapshot is an orphan — age-gated
        now = time.time()
        deleted_dirs = 0
        freed = 0
        data_root = os.path.join(self.path, "data")
        for commit_name in list(os.listdir(data_root)):
            commit_dir = os.path.join(data_root, commit_name)
            if not os.path.isdir(commit_dir):
                continue
            for bucket_name in list(os.listdir(commit_dir)):
                bdir = os.path.normpath(os.path.join(commit_dir, bucket_name))
                if not os.path.isdir(bdir) or bdir in kept_refs:
                    continue
                if bdir not in expired_refs:
                    try:
                        if now - os.path.getmtime(bdir) < orphan_grace_sec:
                            continue
                    except OSError:  # pragma: no cover
                        continue
                freed += _du([bdir])
                shutil.rmtree(bdir, ignore_errors=True)
                deleted_dirs += 1
            if not os.listdir(commit_dir):
                shutil.rmtree(commit_dir, ignore_errors=True)
        for v in expired:
            os.remove(os.path.join(self.snap_dir, f"v{v:08d}.json"))
        return {"expired": expired, "deleted_dirs": deleted_dirs, "freed_bytes": freed}

    def with_bucket(self, df):
        snap = self.snapshot()
        return df.withColumn("_bucket", _bucket_col(snap["key_cols"], snap["n_buckets"]))

    def evolve_schema(self, actions) -> int:
        """Apply registry SchemaActions (add/drop metadata-only; retype
        rewrites data files through a cast)."""
        snap = self.snapshot()
        schema = [tuple(c) for c in snap["schema"]]
        names = [n for n, _ in schema]
        needs_rewrite = False
        for a in actions:
            if a.kind == "add" and a.column not in names:
                schema.append((a.column, a.spark_type))
            elif a.kind == "drop" and a.column in names:
                schema = [(n, t) for n, t in schema if n != a.column]
            elif a.kind == "retype":
                schema = [(n, a.spark_type if n == a.column else t) for n, t in schema]
                needs_rewrite = True
            names = [n for n, _ in schema]
        if not needs_rewrite:
            return self.commit({}, [], schema=schema)
        # retype: rewrite every bucket (resolving deltas) with a cast
        old = self.read()
        cast = old.select(
            *[F.col(n).cast(t).alias(n) for n, t in schema]
        )
        staged = self.write_buckets(self.with_bucket(cast).select("*"), self.current_version() + 1)
        all_buckets = set(self.snapshot()["buckets"]) | set(self.snapshot().get("deltas", {}))
        return self.commit(staged, [int(b) for b in all_buckets], schema=schema)


def _write_json(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1)
    os.replace(tmp, path)


def _atomic_write(path: str, text: str) -> None:
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path))
    with os.fdopen(fd, "w") as f:
        f.write(text)
    os.replace(tmp, path)
