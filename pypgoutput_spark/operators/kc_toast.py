"""Resolution of key-change UPDATEs that carry unchanged-TOAST cells.

PostgreSQL can emit an UPDATE whose key changed (a 'K' before-image with
the OLD key) *and* whose new image marks a column TOAST-unchanged ('u').
Serial semantics (reference reader.py:157-172 applies events one at a
time): the new row's 'u' column takes the OLD key's value as of that
event — which may come from an earlier event in the same batch (possibly
itself a pending key-change), or from the stored table row.

Distributed resolution, bounded-pass (no serial replay):

  - **pending** = key-change U events with any 'u' value column;
  - **carriers** for a key K before LSN L = events that *carry* a value
    for a column (I/U with an explicit cell, D as a NULL reset), plus a
    synthesized D carrier at each key-change's OLD key (the old row
    ceases to exist at that LSN), plus the stored table row at LSN −1
    (skipped when the relation was truncated this batch);
  - pass k: per pending event and column, ``max_by`` over the old key's
    carriers below its LSN. A winner that is itself a *pending*
    key-change defers the event to the next pass; winners resolved in
    pass k patch the carrier set for pass k+1. Chains of key-changes
    within one batch resolve in depth order; chains across batches
    resolve naturally through the stored fallback.
  - events still pending after ``passes`` raise at runtime
    (``raise_error`` inside the patch projection) — the batch fails
    BEFORE its snapshot commit, so exactly-once is preserved and wrong
    data is never merged. Deeper chains need a higher ``passes`` (each
    pass is one broadcast join + one aggregate over the tiny pending
    cohort; with no pending rows AQE's empty-relation propagation prunes
    every stage of this subtree at runtime).

The DuckDB oracle replays the identical bounded-pass algorithm in SQL
(wal.generator.duckdb_final_state_sql), so CORRECTNESS covers the
combination end-to-end.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import functions as F


from pypgoutput_spark.operators.staging import stage as _stage  # noqa: E402
# (shared lineage-cut staging — localCheckpoint, or the session's
# reliable checkpoint dir when configured with checkpoint GC; see
# operators.staging. The pending cohort here is tiny by contract, but
# executor-memory staging of even tiny state is the wrong durability
# class at 1000 executors: an executor loss mid-pass would fail the
# batch.)


def kc_pred(keys: Sequence[str], value_cols: Sequence[str]) -> str:
    key_changed = " OR ".join(f"(__old_{k} IS DISTINCT FROM `{k}`)" for k in keys)
    has_old = " OR ".join(f"__old_{k} IS NOT NULL" for k in keys)
    any_u = " OR ".join(f"coalesce(u_{c}, false)" for c in value_cols)
    return f"(op = 'U' AND ({has_old}) AND ({key_changed}) AND ({any_u}))"


def resolve_kc_toast(proj, table, keys: Sequence[str],
                     value_cols: Sequence[str], passes: int = 4):
    """Patch ``proj`` (the pre-explode flat projection, with ``__old_<k>``
    columns) so every key-change-with-TOAST event carries literal values:
    its 'u' cells are substituted and their u-flags cleared. ``table`` is
    the LakeTable for the stored fallback (pass None when the relation
    was truncated this batch — the store is logically empty)."""
    kc = kc_pred(keys, value_cols)
    kc_any_expr = (
        "(op = 'U' AND ("
        + " OR ".join(f"__old_{k} IS NOT NULL" for k in keys)
        + ") AND ("
        + " OR ".join(f"(__old_{k} IS DISTINCT FROM `{k}`)" for k in keys)
        + "))"
    )

    pending = proj.filter(kc).selectExpr(
        "lsn AS p_lsn",
        *[f"__old_{k} AS pk_{k}" for k in keys],
        *[f"coalesce(u_{c}, false) AS pu_{c}" for c in value_cols],
    )
    # The pending cohort is tiny by contract (key-change ∧ TOAST is a rare
    # combination): materialize it once with a lineage cut. A batch with
    # no pending rows pays exactly one small job (this probe over the
    # staged decode cache) and returns proj untouched; and without the
    # cut, pass i's plan would embed pass i-1's carriers subtree TWICE
    # (directly + via the patch join) — Catalyst analysis time 2^passes.
    pending = _stage(pending)
    if pending.isEmpty():
        return proj

    # carrier set (key, lsn, per column: value / has-info / pending flags)
    ev_car = proj.selectExpr(
        *[f"`{k}` AS k_{k}" for k in keys],
        "lsn",
        *[
            f"CASE WHEN op = 'D' THEN CAST(NULL AS STRING) ELSE `{c}` END AS v_{c}"
            for c in value_cols
        ],
        *[f"(op = 'D' OR NOT coalesce(u_{c}, false)) AS has_{c}" for c in value_cols],
        *[f"({kc} AND coalesce(u_{c}, false)) AS pend_{c}" for c in value_cols],
    )
    del_car = proj.filter(kc_any_expr).selectExpr(
        *[f"__old_{k} AS k_{k}" for k in keys],
        "lsn",
        *[f"CAST(NULL AS STRING) AS v_{c}" for c in value_cols],
        *[f"true AS has_{c}" for c in value_cols],
        *[f"false AS pend_{c}" for c in value_cols],
    )
    carriers = ev_car.unionByName(del_car)

    if table is not None:
        # stored fallback at lsn = -1, restricted to the pending old keys
        # (one semi-joined read; values round-trip through the wire's
        # string form so carrier columns stay uniformly typed)
        old_keys = pending.select(
            *[F.col(f"pk_{k}").alias(f"k_{k}") for k in keys]
        ).distinct()
        stored = (
            table.read()
            .selectExpr(
                *[f"CAST(`{k}` AS STRING) AS k_{k}" for k in keys],
                *[f"CAST(`{c}` AS STRING) AS v_{c}" for c in value_cols],
            )
            .join(F.broadcast(old_keys), on=[f"k_{k}" for k in keys], how="left_semi")
            .selectExpr(
                *[f"k_{k}" for k in keys],
                "CAST(-1 AS BIGINT) AS lsn",
                *[f"v_{c}" for c in value_cols],
                *[f"true AS has_{c}" for c in value_cols],
                *[f"false AS pend_{c}" for c in value_cols],
            )
        )
        carriers = carriers.unionByName(stored)

    # per pass: one broadcast join + one aggregate over cache-backed
    # inputs, each result checkpointed (flat lineage); the loop exits as
    # soon as the cohort drains
    resolved_parts = []
    for i in range(passes):
        cond = F.expr(
            " AND ".join(f"k_{k} = pk_{k}" for k in keys) + " AND lsn < p_lsn"
        )
        j = carriers.join(F.broadcast(pending), on=cond, how="inner")
        win = j.groupBy("p_lsn").agg(
            *[
                F.expr(
                    f"max_by(named_struct('v', v_{c}, 'pend', pend_{c}), lsn) "
                    f"FILTER (WHERE has_{c} OR pend_{c}) AS w_{c}"
                )
                for c in value_cols
            ]
        )
        r = pending.join(win, on="p_lsn", how="left")
        done = " AND ".join(
            f"(NOT pu_{c} OR w_{c} IS NULL OR NOT w_{c}.pend)" for c in value_cols
        )
        r = _stage(r.withColumn("_done", F.expr(done)))
        resolved_parts.append(
            r.filter("_done").selectExpr(
                "p_lsn",
                *[f"CASE WHEN pu_{c} THEN w_{c}.v END AS rv_{c}" for c in value_cols],
                *[f"pu_{c}" for c in value_cols],
                "true AS _resolved",
            )
        )
        pending = r.filter("NOT _done").select(
            "p_lsn",
            *[f"pk_{k}" for k in keys],
            *[f"pu_{c}" for c in value_cols],
        )
        if pending.isEmpty():
            pending = None
            break
        if i < passes - 1:
            # patch the resolved events into the carrier set for the next
            # pass (they now carry literal values for their 'u' columns);
            # the fix side is checkpointed, so the carriers plan grows by
            # one flat join per pass, never recursively
            fix = resolved_parts[-1].selectExpr(
                "p_lsn AS _f_lsn",
                *[f"rv_{c} AS _f_rv_{c}" for c in value_cols],
                *[f"pu_{c} AS _f_pu_{c}" for c in value_cols],
            )
            patched = carriers.join(
                F.broadcast(fix), on=F.expr("lsn = _f_lsn"), how="left"
            )
            carriers = patched.selectExpr(
                *[f"k_{k}" for k in keys],
                "lsn",
                *[
                    f"CASE WHEN _f_lsn IS NOT NULL AND pend_{c} AND _f_pu_{c} "
                    f"THEN _f_rv_{c} ELSE v_{c} END AS v_{c}"
                    for c in value_cols
                ],
                *[
                    f"(has_{c} OR (_f_lsn IS NOT NULL AND pend_{c})) AS has_{c}"
                    for c in value_cols
                ],
                *[f"(pend_{c} AND _f_lsn IS NULL) AS pend_{c}" for c in value_cols],
            )

    # leftovers after `passes` → fail the batch loudly (ADVICE r2: never
    # merge silently-NULL data for this combination)
    fixes = resolved_parts[0]
    for part in resolved_parts[1:]:
        fixes = fixes.unionByName(part)
    if pending is not None:
        leftover = pending.selectExpr(
            "p_lsn",
            *[f"CAST(NULL AS STRING) AS rv_{c}" for c in value_cols],
            *[f"pu_{c}" for c in value_cols],
            "false AS _resolved",
        )
        fixes = fixes.unionByName(leftover)
    fixes = fixes.selectExpr(
        "p_lsn AS _fx_lsn",
        *[f"rv_{c} AS _fx_rv_{c}" for c in value_cols],
        *[f"pu_{c} AS _fx_pu_{c}" for c in value_cols],
        "_resolved AS _fx_ok",
    )

    out = proj.join(F.broadcast(fixes), on=F.expr("lsn = _fx_lsn"), how="left")
    patch_cols = {}
    for c in value_cols:
        patch_cols[c] = F.expr(
            f"CASE WHEN _fx_lsn IS NOT NULL AND NOT _fx_ok THEN "
            f"raise_error(concat('key-change TOAST chain unresolved after "
            f"{passes} passes at lsn=', CAST(lsn AS STRING), "
            f"' — raise kc_toast_passes')) "
            f"WHEN _fx_lsn IS NOT NULL AND _fx_pu_{c} THEN _fx_rv_{c} "
            f"ELSE `{c}` END"
        )
        patch_cols[f"u_{c}"] = F.expr(
            f"u_{c} AND NOT coalesce(_fx_pu_{c} AND _fx_ok, false)"
        )
    out = out.withColumns(patch_cols)
    return out.drop(
        "_fx_lsn", "_fx_ok",
        *[f"_fx_rv_{c}" for c in value_cols],
        *[f"_fx_pu_{c}" for c in value_cols],
    )
