"""Incremental materialized-view maintenance over the lake change feed.

The downstream half of CDC: a consumer that keeps a GROUP-BY aggregate
(count + sum — the self-maintainable class) in sync with a LakeTable by
reading ``table.changes(v-1, v)`` per commit instead of rescanning the
table. The algebra is the classic delta-maintenance rule

    MV_v = MV_{v-1}  ⊕  agg(post-images of commit v)
                     ⊖  agg(pre-images of commit v)

Pre-images are NOT in the feed (the feed is post-image + ``upd_<col>``
flags); they are fetched by reading the table *at the parent snapshot*
restricted to (a) the commit's dirty buckets — file-level pruning from
the snapshot's own delta/cdf manifest, no full scan — and (b) the
commit's changed keys (left-semi join). At production scale the changed
key set per commit is tiny relative to the base, so the pre-image fetch
is a bucket-pruned scan + a semi-join, which is exactly how Delta/Iceberg
merge sources find their matches.

TOAST-unchanged cells (``upd_<col> = false``) are resolved from the
pre-image row — the feed's contract is that such a cell's prior value
still stands, and (commit-granularity invariant) the key existed at the
parent version, because an insert + TOAST-update inside one batch
collapses to a carrier that holds the inserted value (``upd = true``).

Truncate commits reset the MV (the 'T' marker contract) and re-feed the
commit's re-inserts in the same feed read. Compaction and schema-change
commits are metadata-skipped — they change no row logically.

min/max/count-distinct are NOT maintainable this way (deletes need the
full value multiset); they belong to the recompute-on-schedule class.

Reference scope: the reference (dgea005/pypgoutput) emits change events
for consumers to apply themselves (README.md:46-58); this operator is
one such consumer, kept inside the engine so the contract is tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pypgoutput_spark.operators.staging import stage


def incremental_group_mv(table, group_col: str, length_col: str,
                         since_version: int = 0,
                         mv: DataFrame | None = None) -> DataFrame:
    """Maintain ``SELECT {group_col}, count(*) AS n_docs,
    sum(length({length_col})) AS n_chars`` over ``table``'s state,
    incrementally from commit ``since_version + 1`` through current.

    ``mv``: the view state as of ``since_version`` (None = empty — i.e.
    the table was empty at ``since_version``). Returns the MV at the
    current version; groups whose count reaches zero drop out, matching
    a recompute. Per commit: one bucket-pruned pre-image read, two
    map-side-combining aggregates, and a lineage-cut union with the
    running state (the MV itself is one row per group — small).
    """
    spark = table.spark
    snap = table.snapshot()
    keys = snap["key_cols"]
    col_types = dict(snap["schema"])
    for c in (group_col, length_col):
        if c in keys or c not in col_types:
            raise ValueError(f"MV column {c!r} must be a value column")
    gtype = col_types[group_col]
    empty = spark.createDataFrame(
        [], schema=f"`{group_col}` {gtype}, n_docs BIGINT, n_chars BIGINT"
    )
    if mv is None:
        mv = empty
    cur = table.current_version()

    for v in range(since_version + 1, cur + 1):
        s = table.snapshot(v)
        metrics = s.get("metrics", {})
        truncated = bool(metrics.get("truncated"))
        parent = s.get("parent")
        prev_snap = table.snapshot(parent) if parent is not None else {"buckets": {}}
        if "compaction" in metrics or (
            not truncated and s.get("schema") != prev_snap.get("schema")
        ):
            continue  # rewrites with no logical row change
        added = table.delta_dirs_added(v)
        dirty = sorted(set(added) | set(s.get("cdf", {})))
        # base rewrites (initial load / truncate batch) feed through the
        # marker + re-insert branch of changes(); anything else with an
        # unchanged base and no deltas is a metadata-only commit
        base_changed = s.get("buckets") != prev_snap.get("buckets")
        if not (truncated or dirty or base_changed):
            continue  # metadata-only commit (watermark bump)

        feed = table.changes(v - 1, v).filter("final_op <> 'T'")
        if truncated:
            mv = empty  # 'T' marker contract: full reset, then re-inserts

        prev_populated = bool(prev_snap.get("buckets"))
        if truncated or not prev_populated:
            pre = None
        else:
            # no .distinct() on the key set: LEFT SEMI dedups inherently,
            # and the feed is already one row per key per commit
            keys_df = feed.select(*keys)
            pre = (
                table.read(version=v - 1, buckets=dirty)
                .join(keys_df, list(keys), "left_semi")
                .select(*keys, group_col, length_col)
            )

        post = feed.filter("final_op IN ('I','U')")
        if pre is not None:
            pre_r = pre.select(
                *keys,
                F.col(group_col).alias("_pre_g"),
                F.col(length_col).alias("_pre_l"),
            )
            post = post.join(pre_r, list(keys), "left")
            g = F.expr(f"CASE WHEN upd_{group_col} THEN `{group_col}` ELSE _pre_g END")
            l = F.expr(f"CASE WHEN upd_{length_col} THEN `{length_col}` ELSE _pre_l END")
        else:
            g = F.col(group_col)
            l = F.col(length_col)

        plus = post.groupBy(g.alias(group_col)).agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length(l)).cast("bigint").alias("n_chars"),
        )
        parts = [mv, plus]
        if pre is not None:
            minus = pre.groupBy(group_col).agg(
                (-F.count("*")).cast("bigint").alias("n_docs"),
                (-F.sum(F.length(F.col(length_col)))).cast("bigint").alias("n_chars"),
            )
            parts.append(minus)
        merged = parts[0]
        for p in parts[1:]:
            merged = merged.unionByName(p)
        mv = stage(
            merged.groupBy(group_col)
            .agg(
                F.sum("n_docs").alias("n_docs"),
                F.sum("n_chars").cast("bigint").alias("n_chars"),
            )
            .filter("n_docs > 0")
        )
    return mv
