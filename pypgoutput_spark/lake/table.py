"""LakeTable: a minimal snapshot-versioned, hash-bucketed lake table.

The north rule targets Iceberg ``MERGE INTO``; this sandbox ships no
Iceberg/Delta jars, so the same design is implemented directly on parquet
with the properties the rule actually needs:

  - **Hash-bucket layout**: rows are bucketed by
    ``pmod(xxhash64(key_cols), n_buckets)`` (Iceberg ``bucket(N, key)``
    analog). A merge rewrites only buckets touched by the change set —
    the copy-on-write unit — so merge cost scales with the change set,
    not the table. Bucket pruning happens at the file level (each commit
    writes one directory per touched bucket).
  - **Atomic snapshot commits**: a snapshot JSON lists, per bucket, the
    data directories that constitute it, plus the schema and the
    ``watermark_lsn``. Publishing = atomic rename of the CURRENT pointer.
    Readers resolve CURRENT → snapshot → exact file set; a crashed writer
    leaves only unreferenced staging files (never a torn table).
  - **Exactly-once**: ``watermark_lsn`` (the applied-through LSN, the
    analog of the reference's ``send_feedback(flush_lsn)`` ack protocol,
    reference reader.py:374-390) commits in the *same* atomic snapshot as
    the data. Replaying a batch whose max LSN ≤ watermark is a no-op.
  - **Schema evolution**: snapshots carry the schema; adds/drops are
    metadata-only (old files are read through the current schema — parquet
    fills missing columns with NULL and prunes dropped ones); retypes
    rewrite (rare DDL).
  - **Lineage/metrics**: every snapshot embeds the batch's applied /
    deleted / skipped counters and per-bucket file provenance.

At 100 TB scale, ``n_buckets`` is sized so a bucket ≈ a few GB; the
listing in a snapshot stays in the thousands of entries, and the merge
join shuffles only touched buckets.
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
        return ", ".join(f"{n} {t}" for n, t in snap["schema"])

    # ------------------------------------------------------------------ read

    def read(self, version: Optional[int] = None, buckets: Optional[Sequence[int]] = None):
        """DataFrame of the table state at a snapshot (default: current).

        ``buckets`` restricts the scan to the given hash buckets —
        file-level pruning, the workhorse of merge (only touched buckets
        are ever read).
        """
        snap = self.snapshot(version)
        sel: Dict[str, List[str]] = snap["buckets"]
        if buckets is not None:
            keys = {str(b) for b in buckets}
            sel = {b: dirs for b, dirs in sel.items() if b in keys}
        dirs = [d for dd in sel.values() for d in dd]
        ddl = self.schema_ddl(snap)
        if not dirs:
            return self.spark.createDataFrame([], schema=ddl)
        # explicit schema: evolution-safe (missing columns → NULL, dropped
        # columns pruned at the parquet reader)
        return self.spark.read.schema(ddl).parquet(*dirs)

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
    ) -> int:
        """Publish a new snapshot: touched buckets point at new dirs,
        untouched buckets carry over (unless ``truncate``)."""
        prev = self.snapshot()
        version = prev["version"] + 1
        buckets: Dict[str, List[str]] = {} if truncate else dict(prev["buckets"])
        for b in replaced_buckets:
            buckets.pop(str(b), None)
        for b, dirs in new_buckets.items():
            buckets[str(b)] = dirs
        snap = {
            "version": version,
            "schema": [list(c) for c in (schema or prev["schema"])],
            "key_cols": prev["key_cols"],
            "n_buckets": prev["n_buckets"],
            "buckets": buckets,
            "watermark_lsn": prev["watermark_lsn"] if watermark_lsn is None else watermark_lsn,
            "parent": prev["version"],
            "props": prev["props"],
            "metrics": metrics or {},
            "created_at": time.time(),
        }
        _write_json(os.path.join(self.snap_dir, f"v{version:08d}.json"), snap)
        _atomic_write(os.path.join(self.meta_dir, CURRENT), str(version))
        return version

    # ----------------------------------------------------------- maintenance

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
        # retype: rewrite every bucket with a cast (rare DDL path)
        old = self.read()
        cast = old.select(
            *[F.col(n).cast(t).alias(n) for n, t in schema]
        )
        staged = self.write_buckets(self.with_bucket(cast).select("*"), self.current_version() + 1)
        return self.commit(staged, [int(b) for b in self.snapshot()["buckets"]], schema=schema)


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
