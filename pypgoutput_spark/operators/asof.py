"""As-of and range joins — the two time-series joins Spark lacks natively.

Both are implemented as *equi-join-shaped* plans, never inequality joins
(Spark plans a non-equi join as BroadcastNestedLoop/cartesian — the 100 TB
scale-killer):

  - ``asof_join``: union-and-window. Tag both inputs, union them, and run a
    single ``last(col, ignorenulls)`` window per carried column over
    ``(key ORDER BY t, side, tie)``. One shuffle on the key, one sort, zero
    row explosion — each left row picks up the most recent right row at or
    before its timestamp. This is the canonical distributed as-of shape
    (kdb aj / pandas merge_asof semantics) at O(n log n) per partition.
  - ``range_join``: fixed-width interval binning. For the predicate
    ``r_t <= l_t < r_t + width``, the left row's bin is either the right
    row's bin or the one after, so exploding the RIGHT side into its two
    candidate bins turns the interval join into an exact equi-join on
    ``(key, bin)`` + a residual filter. Each matching pair is produced by
    exactly one candidate bin (no dedup needed). Right side doubles, left
    side never explodes — put the smaller relation on the right.

The query entries join the events stream against a deterministic "promos"
side derived from ``orders`` (order timestamps mapped into the events'
30-day window via the shared md5-derived integers, so both engines build
bit-identical inputs). The DuckDB oracles intentionally use a *different*
algorithm — a plain inequality join plus ``row_number`` / group-by — so a
hash match validates the equi-join re-expression, not a shared code path.

Reference scope note: the reference pipeline (dgea005/pypgoutput) stops at
decoded change events; these joins are part of the downstream analytics
surface this engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pypgoutput_spark.functions.detsql import DUCKDB, SPARK, Dialect
from pypgoutput_spark.operators.analytics import _epoch_us
from pypgoutput_spark.operators.qlib import register_views

#: 2024-01-01T00:00:00Z in epoch microseconds (events table range start)
EPOCH_2024_US = 1_704_067_200_000_000
#: events span 30 days; promos are scattered across the same window
SPAN_US = 30 * 86_400 * 1_000_000
#: range-join window width: 6 hours
RANGE_W_US = 6 * 3600 * 1_000_000


# ---------------------------------------------------------------- operators
def asof_join(left: DataFrame, right: DataFrame, key: str, left_t: str,
              right_t: str, carry: tuple, right_tie: str,
              prefix: str = "asof_") -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_t <= left_t`` on the same ``key`` (ties broken by the highest
    ``right_tie``); NULL-filled when no right row precedes the left row.

    Output: every left column, plus ``<prefix><c>`` for each ``c`` in
    ``carry``. One shuffle (hash on ``key``) + one per-partition sort; the
    matched right row travels as ONE struct through a single
    ``last(ignorenulls)`` — the struct is non-null for every right row even
    when individual carry columns are NULL, so the output never mixes
    columns from different right rows (per-column last() would tear rows:
    a NULL carry cell would fall through to an older right row for that
    column only). Skewed keys cost what any keyed shuffle costs —
    pre-salt upstream if one key dominates.
    """
    lstruct = F.struct(*[F.col(c) for c in left.columns]).alias("_l")
    l2 = left.select(
        F.col(key).alias("_k"),
        F.col(left_t).cast("bigint").alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(0).cast("bigint").alias("_tie"),
        lstruct,
    )
    ltype = l2.schema["_l"].dataType
    r2 = right.select(
        F.col(key).alias("_k"),
        F.col(right_t).cast("bigint").alias("_t"),
        F.lit(0).alias("_side"),
        F.col(right_tie).cast("bigint").alias("_tie"),
        F.lit(None).cast(ltype).alias("_l"),
        F.struct(*[F.col(c) for c in carry]).alias("_carry"),
    )
    ctype = r2.schema["_carry"].dataType
    u = l2.withColumn("_carry", F.lit(None).cast(ctype)).unionByName(r2)
    # right rows (side 0) sort before left rows at the same _t, so an
    # exactly-simultaneous right row IS visible to the left row (<=
    # semantics); among simultaneous right rows the highest tie wins
    # (last() takes the latest in sort order)
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side", "_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    picked = F.last("_carry", ignorenulls=True).over(w).alias("_pick")
    u = u.select("_side", "_l", picked)
    return u.where("_side = 1").select(
        "_l.*", *[F.col("_pick").getField(c).alias(prefix + c) for c in carry]
    )


def _floor_bin(t: str, width: int) -> str:
    """Floor-division bin that agrees with window() for any sign of t
    (DIV truncates toward zero; normalize via double-mod first)."""
    return f"(({t} - ((({t} % {width}) + {width}) % {width})) DIV {width})"


def range_join(left: DataFrame, right: DataFrame, key: str, left_t: str,
               right_t: str, width_us: int) -> DataFrame:
    """Inner join of pairs satisfying ``right_t <= left_t < right_t +
    width_us`` on the same ``key``, as an equi-join on ``(key, bin)``.

    Column names other than ``key`` must be disjoint between the inputs.
    The right side is exploded into its two candidate bins (put the
    smaller relation there); each qualifying pair matches through exactly
    one candidate, so no post-join dedup is needed.
    """
    overlap = (set(left.columns) & set(right.columns)) - {key}
    if overlap:
        raise ValueError(f"range_join column collision: {sorted(overlap)}")
    r2 = right.withColumn(
        "_jbin",
        F.explode(F.expr(
            f"array({_floor_bin(right_t, width_us)},"
            f" {_floor_bin(right_t, width_us)} + 1)"
        )),
    )
    l2 = left.withColumn("_jbin", F.expr(_floor_bin(left_t, width_us)))
    return (
        l2.join(r2, [key, "_jbin"])
        .where(f"{left_t} >= {right_t} AND {left_t} < {right_t} + {width_us}")
        .drop("_jbin")
    )


# ------------------------------------------------------- dual-dialect inputs
def promos_sql(d: Dialect) -> str:
    """Deterministic promo table: each order lands at an md5-derived
    instant inside the events' 30-day window, keyed to the order's
    customer. Bit-identical in both engines (md5_int)."""
    t = f"{EPOCH_2024_US} + ({d.md5_int(d.s('o_orderkey'))} % {SPAN_US})"
    return (
        "SELECT o_custkey AS user_id, o_orderkey, o_totalprice, "
        f"{t} AS promo_t_us FROM orders"
    )


def _events_sql(d: Dialect) -> str:
    return (
        f"SELECT event_id, user_id, value, {_epoch_us(d, 'ts')} AS t_us "
        "FROM events"
    )


# -------------------------------------------------------------- query entries
def q_events_asof_promos(spark, sf_dir: str) -> DataFrame:
    """Each event annotated with the customer's most recent promo at the
    event's timestamp (NULL before the first promo)."""
    register_views(spark, sf_dir, ("events", "orders"))
    ev = spark.sql(_events_sql(SPARK)).drop("value")
    pr = spark.sql(promos_sql(SPARK))
    out = asof_join(
        ev, pr, key="user_id", left_t="t_us", right_t="promo_t_us",
        carry=("o_orderkey", "o_totalprice"), right_tie="o_orderkey",
    )
    return out.select(
        "event_id", "user_id", F.col("t_us").alias("ts_us"),
        F.col("asof_o_orderkey").alias("asof_orderkey"),
        F.col("asof_o_totalprice").alias("asof_totalprice"),
    )


def events_asof_promos_oracle(d: Dialect = DUCKDB) -> str:
    return f"""
WITH promos AS ({promos_sql(d)}),
ev AS ({_events_sql(d)}),
ranked AS (
  SELECT ev.event_id, ev.user_id, ev.t_us,
    p.o_orderkey, p.o_totalprice,
    row_number() OVER (PARTITION BY ev.event_id
                       ORDER BY p.promo_t_us DESC, p.o_orderkey DESC) AS rn
  FROM ev LEFT JOIN promos p
    ON p.user_id = ev.user_id AND p.promo_t_us <= ev.t_us
)
SELECT event_id, user_id, t_us AS ts_us,
  o_orderkey AS asof_orderkey, o_totalprice AS asof_totalprice
FROM ranked WHERE rn = 1
""".strip()


def q_events_range_promos(spark, sf_dir: str) -> DataFrame:
    """Per promo: the events its customer produced within the 6 hours
    starting at the promo instant (inner — promos with no events drop)."""
    register_views(spark, sf_dir, ("events", "orders"))
    ev = spark.sql(_events_sql(SPARK)).drop("event_id")
    pr = spark.sql(promos_sql(SPARK)).drop("o_totalprice")
    j = range_join(ev, pr, key="user_id", left_t="t_us",
                   right_t="promo_t_us", width_us=RANGE_W_US)
    return j.groupBy("o_orderkey").agg(
        F.count("*").alias("n_events"),
        F.expr(f"{SPARK.exact_sum('value')}").alias("sum_value"),
        F.min("t_us").alias("first_event_us"),
    )


def events_range_promos_oracle(d: Dialect = DUCKDB) -> str:
    return f"""
WITH promos AS ({promos_sql(d)}),
ev AS ({_events_sql(d)})
SELECT p.o_orderkey, count(*) AS n_events,
  {d.exact_sum('ev.value')} AS sum_value,
  min(ev.t_us) AS first_event_us
FROM promos p JOIN ev
  ON ev.user_id = p.user_id
 AND ev.t_us >= p.promo_t_us AND ev.t_us < p.promo_t_us + {RANGE_W_US}
GROUP BY p.o_orderkey
""".strip()


QUERIES = {
    "join_events_asof_promos": (q_events_asof_promos, events_asof_promos_oracle()),
    "join_events_range_promos": (q_events_range_promos, events_range_promos_oracle()),
}
