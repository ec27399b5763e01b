"""SCD Type-2 history from the change-data-feed.

The classic downstream consumer of a CDC feed (reference scope: the
pgoutput events the reference's ``LogicalReplicationReader`` hands to the
application are exactly what warehouses turn into slowly-changing
dimensions): every upsert the feed carries opens a *version* of its key,
the next feed row for the same key (upsert or delete) closes it, and the
newest open version is ``is_current``. Values a commit carried no
information for (``upd_<col> = false`` — e.g. an unchanged TOAST cell)
inherit from the key's last carrying version, exactly the merge rule the
lake applies (lake/table.py resolution aggregate), so the history's row
images equal what a snapshot read would have returned at that version.

Scale shape: the feed read is delta files only (cost ∝ change set,
LakeTable.changes), and the transform is ONE hash exchange on the key —
two window passes over the same ``PARTITION BY key ORDER BY version``
sort (carry-forward + lead), no joins, no driver iteration. Truncate
markers ('T', NULL keys — O(1) rows per truncate) are collected
driver-side and applied as a literal-array close: a version stays open
across a truncate only if nothing closed it earlier, otherwise it closes
at the truncate version with no closing LSN (the marker is not
row-tracked, mirroring ``changes()``'s contract).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: feed bookkeeping columns (LakeTable.changes contract)
_OP, _LSN, _VER = "final_op", "max_lsn", "_commit_version"


def scd2_history(
    feed: DataFrame,
    key_cols: Sequence[str],
    value_cols: Sequence[str],
    truncate_versions: Optional[Sequence[int]] = None,
) -> DataFrame:
    """Build the Type-2 dimension history for ``feed`` (a
    ``LakeTable.changes`` frame or anything matching its contract).

    Returns one row per (key, version opened): key cols, the *effective*
    value cols (carry-forward applied), ``valid_from_version`` /
    ``valid_from_lsn`` (the opening commit), ``valid_to_version`` /
    ``valid_to_lsn`` (NULL while open; ``valid_to_lsn`` is also NULL
    when a truncate closed the version — markers carry no row LSN), and
    ``is_current``.

    ``truncate_versions`` overrides marker discovery (pass ``()`` to
    skip the tiny driver-side marker collect when the caller already
    knows the feed range holds none).
    """
    key_cols, value_cols = list(key_cols), list(value_cols)
    if truncate_versions is None:
        truncate_versions = [
            r[0]
            for r in feed.where(F.col(_OP) == "T")
            .select(_VER).distinct().collect()
        ]
    tvs = sorted(int(v) for v in truncate_versions)

    rows = feed.where(F.col(_OP) != "T")
    wk = Window.partitionBy(*key_cols).orderBy(_VER)
    wcum = wk.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    # Carry-forward: the effective value is the last one a commit
    # actually carried (struct-wrapped so a carried NULL — a delete's
    # explicit reset — is distinct from "not carried").
    for c in value_cols:
        carried = F.when(F.col(f"upd_{c}"), F.struct(F.col(c).alias("v")))
        rows = rows.withColumn(
            f"__eff_{c}", F.last(carried, ignorenulls=True).over(wcum)["v"]
        )

    rows = rows.withColumn("__next_ver", F.lead(_VER).over(wk))
    rows = rows.withColumn("__next_lsn", F.lead(_LSN).over(wk))

    # First truncate version after this row's opening commit, if any
    # (literal array: O(#truncates) constants, never a join).
    if tvs:
        tv_arr = F.array(*[F.lit(v) for v in tvs])
        rows = rows.withColumn(
            "__tv_close",
            F.array_min(F.filter(tv_arr, lambda x: x > F.col(_VER))),
        )
    else:
        rows = rows.withColumn("__tv_close", F.lit(None).cast("int"))

    # Whichever close comes first wins: the key's next feed row, or a
    # truncate between this version and that row (re-inserts after a
    # truncate land at later versions, so the truncate closes first).
    next_closes = F.col("__next_ver").isNotNull() & (
        F.col("__tv_close").isNull()
        | (F.col("__next_ver") <= F.col("__tv_close"))
    )
    valid_to_ver = (
        F.when(next_closes, F.col("__next_ver"))
        .otherwise(F.col("__tv_close"))
        .cast("int")
    )
    valid_to_lsn = F.when(next_closes, F.col("__next_lsn")).cast("long")

    out = rows.where(F.col(_OP) != "D").select(
        *key_cols,
        *[F.col(f"__eff_{c}").alias(c) for c in value_cols],
        F.col(_VER).cast("int").alias("valid_from_version"),
        F.col(_LSN).cast("long").alias("valid_from_lsn"),
        valid_to_ver.alias("valid_to_version"),
        valid_to_lsn.alias("valid_to_lsn"),
        valid_to_ver.isNull().alias("is_current"),
    )
    return out


def scd2_oracle_sql(
    feed_sql: str,
    key_cols: Sequence[str],
    value_cols: Sequence[str],
) -> str:
    """DuckDB rendering of :func:`scd2_history` over ``feed_sql`` (a
    query producing the change-feed contract, e.g. the driver's
    independent feed oracle). No-truncate feeds only — the driver-gated
    entry uses a truncate-free stream; marker close is pinned in pytest.
    """
    keys = ", ".join(f'"{c}"' for c in key_cols)
    eff = ",\n    ".join(
        f"last_value(CASE WHEN upd_{c} THEN {{'v': \"{c}\"}} END IGNORE NULLS)"
        f" OVER wcum AS eff_{c}"
        for c in value_cols
    )
    vals = ", ".join(f'eff_{c}.v AS "{c}"' for c in value_cols)
    return f"""
WITH scd_feed AS ({feed_sql}),
scd_eff AS (
  SELECT {keys}, final_op, max_lsn, commit_version,
    {eff},
    lead(commit_version) OVER wk AS next_ver,
    lead(max_lsn) OVER wk AS next_lsn
  FROM scd_feed
  WINDOW
    wk AS (PARTITION BY {keys} ORDER BY commit_version),
    wcum AS (PARTITION BY {keys} ORDER BY commit_version
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT {keys}, {vals},
  CAST(commit_version AS INT) AS valid_from_version,
  CAST(max_lsn AS BIGINT) AS valid_from_lsn,
  CAST(next_ver AS INT) AS valid_to_version,
  CAST(next_lsn AS BIGINT) AS valid_to_lsn,
  (next_ver IS NULL) AS is_current
FROM scd_eff WHERE final_op <> 'D'
""".strip()
