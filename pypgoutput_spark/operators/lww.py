"""Last-write-wins collapse of a change-event batch to one row per key.

The reference applies events strictly serially (reader.py:157-172), so
LWW is implicit. A distributed micro-batch may hold many changes for one
(repo, path); before merging we collapse them to the single effective
change per key — *without a sort*:

    groupBy(key).agg(max_by(..., lsn) FILTER (...))

max_by is an associative aggregate, so Spark performs partial (map-side)
combine inside each input partition before the shuffle: per-key traffic
is O(#partitions), not O(#events). That is inherently skew-resistant —
a hot key that dominates a batch still only ships one partial row per
upstream partition — and beats the row_number()-window formulation,
which must shuffle *all* events of a key into one task and sort them.
An optional explicit salting phase (``salt_buckets``) adds a second
pre-aggregation keyed by (key, salt) for pathological single-key floods,
per the scale rule (BASELINE.json north_rule "skew salting").

TOAST semantics (SURVEY.md §7 hard parts): each value column resolves to
the max-LSN event that *carries information* for it — a non-'u' I/U (its
own value, possibly NULL) or a D (explicit reset: a 'u' update applied
after an in-batch delete re-creates the row with NULL, never resurrecting
the pre-delete value). Columns with no in-batch information resolve to a
NULL struct → the merge falls back to the target's current value.

Output schema: key cols, ``final_op`` ('I'/'U'/'D'), ``max_lsn``, and one
``r_<col> STRUCT<v: STRING>`` per value column (NULL struct = keep target).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import functions as F


def _resolved_expr(col: str) -> str:
    """Aggregate resolving one value column (see module docstring)."""
    return (
        f"max_by(named_struct('v', CASE WHEN op = 'D' THEN CAST(NULL AS STRING) "
        f"ELSE after['{col}'] END), lsn) "
        f"FILTER (WHERE op = 'D' OR NOT array_contains(coalesce(after_unchanged, array()), '{col}')) "
        f"AS r_{col}"
    )


def lww_changes(events_df, key_cols: Sequence[str], value_cols: Sequence[str],
                salt_buckets: int = 0):
    """Collapse decoded I/U/D events (single relation) to one row per key."""
    # D events carry the key in `before` (replica-identity image,
    # reference reader.py:286-305); I/U carry it in `after`.
    key_sel = [
        f"CASE WHEN op = 'D' THEN before['{k}'] ELSE after['{k}'] END AS {k}"
        for k in key_cols
    ]
    base = events_df.selectExpr(
        *key_sel, "op", "lsn", "after", "after_unchanged"
    )

    final_aggs = [
        "max_by(op, lsn) AS final_op",
        "max(lsn) AS max_lsn",
        "count(*) AS n_events",
    ]
    if salt_buckets <= 1:
        aggs = final_aggs + [_resolved_expr(c) for c in value_cols]
        return base.groupBy(*key_cols).agg(*[F.expr(a) for a in aggs])

    # explicit two-phase salted aggregation for pathological key skew
    salted = base.withColumn("_salt", F.pmod(F.xxhash64("lsn"), F.lit(salt_buckets)))
    phase1_aggs = (
        ["max_by(op, lsn) AS final_op", "max(lsn) AS max_lsn", "count(*) AS n_events"]
        + [_resolved_expr(c) for c in value_cols]
        + [
            f"max(lsn) FILTER (WHERE op = 'D' OR NOT "
            f"array_contains(coalesce(after_unchanged, array()), '{c}')) AS r_{c}_lsn"
            for c in value_cols
        ]
    )
    p1 = salted.groupBy(*key_cols, "_salt").agg(*[F.expr(a) for a in phase1_aggs])
    phase2_aggs = (
        [
            "max_by(final_op, max_lsn) AS final_op",
            "max(max_lsn) AS max_lsn",
            "sum(n_events) AS n_events",
        ]
        + [
            f"max_by(r_{c}, r_{c}_lsn) FILTER (WHERE r_{c} IS NOT NULL) AS r_{c}"
            for c in value_cols
        ]
    )
    return p1.groupBy(*key_cols).agg(*[F.expr(a) for a in phase2_aggs])


def _resolved_expr_flat(col: str) -> str:
    """Aggregate resolving one value column over the flat (positional)
    projection: plain columns ``<col>`` + ``u_<col>`` instead of maps."""
    return (
        f"max_by(named_struct('v', CASE WHEN op = 'D' THEN CAST(NULL AS STRING) "
        f"ELSE `{col}` END), lsn) "
        f"FILTER (WHERE op = 'D' OR NOT coalesce(u_{col}, false)) AS r_{col}"
    )


def lww_changes_flat(projected_df, key_cols: Sequence[str],
                     value_cols: Sequence[str], salt_buckets: int = 0,
                     bucket_expr=None):
    """LWW over the flat projection (operators.decode.project_relation):
    same semantics as :func:`lww_changes`, but the shuffle carries plain
    string columns instead of map objects — the hot-path form.

    ``bucket_expr``: the target table's hash-bucket expression over the
    (already type-cast) key columns. When given (and unsalted), the
    collapse SHARES its exchange with the merge's bucket placement: the
    events are repartitioned by ``_bucket`` once and the aggregate groups
    by (``_bucket``, keys) — hash partitioning on a subset of the group
    keys satisfies the aggregate's required distribution, so Catalyst
    plans NO second exchange, and the output is already laid out for the
    per-bucket delta write (merge_into/write_buckets skip their
    repartition). One exchange instead of two per merge. The trade: the
    exchange carries raw events instead of map-combined partials — the
    right side of the trade when events-per-key-per-partition is low
    (CDC change batches); for pathological single-key floods use
    ``salt_buckets``, which keeps the two-phase combining shape.
    """
    final_aggs = [
        "max_by(op, lsn) AS final_op",
        "max(lsn) AS max_lsn",
        "count(*) AS n_events",
    ]
    if salt_buckets <= 1:
        aggs = final_aggs + [_resolved_expr_flat(c) for c in value_cols]
        if bucket_expr is not None:
            pre = projected_df.withColumn("_bucket", bucket_expr).repartition(
                F.col("_bucket")
            )
            return pre.groupBy("_bucket", *key_cols).agg(
                *[F.expr(a) for a in aggs]
            )
        return projected_df.groupBy(*key_cols).agg(*[F.expr(a) for a in aggs])

    salted = projected_df.withColumn(
        "_salt", F.pmod(F.xxhash64("lsn"), F.lit(salt_buckets))
    )
    phase1_aggs = (
        final_aggs
        + [_resolved_expr_flat(c) for c in value_cols]
        + [
            f"max(lsn) FILTER (WHERE op = 'D' OR NOT coalesce(u_{c}, false)) "
            f"AS r_{c}_lsn"
            for c in value_cols
        ]
    )
    p1 = salted.groupBy(*key_cols, "_salt").agg(*[F.expr(a) for a in phase1_aggs])
    phase2_aggs = (
        [
            "max_by(final_op, max_lsn) AS final_op",
            "max(max_lsn) AS max_lsn",
            "sum(n_events) AS n_events",
        ]
        + [
            f"max_by(r_{c}, r_{c}_lsn) FILTER (WHERE r_{c} IS NOT NULL) AS r_{c}"
            for c in value_cols
        ]
    )
    return p1.groupBy(*key_cols).agg(*[F.expr(a) for a in phase2_aggs])


# NOTE: truncate barriers are relation-scoped and live in
# streaming.pipeline.apply_frames_batch (parsed from the 'T' cohort's
# relation-id lists) — a frame-level barrier here would wrongly apply one
# relation's Truncate to another relation's events.
