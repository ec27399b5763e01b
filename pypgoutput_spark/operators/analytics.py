"""Analytic / CDC-adjacent operators over the test star schema.

Demonstrates the general query surface (aggregation, joins, windows,
sessionization, top-k, JSON extraction) with hash-stable oracles:

  - double-typed measures are summed through exact DECIMAL casts
    (order-free), then returned as doubles;
  - timestamps are returned as epoch microseconds (bigint) to dodge
    engine-specific timezone/precision rendering;
  - top-k orderings carry a unique tie-break key.

Scale notes: the star joins broadcast the dimension side (nation,
region, customer at TPC-H proportions); Q1-style aggregations partial-
aggregate map-side; sessionization shuffles once on user_id.
"""

from __future__ import annotations

from pypgoutput_spark.functions.detsql import DUCKDB, SPARK, Dialect
from pypgoutput_spark.operators.qlib import run_sql


def _epoch_us(d: Dialect, expr: str) -> str:
    if d.name == "spark":
        # parquet naive timestamps read as TIMESTAMP_NTZ; session tz is UTC,
        # so the cast interprets the wall-clock as UTC — matching DuckDB's
        # epoch_us over the same naive value
        return f"unix_micros(CAST({expr} AS TIMESTAMP))"
    return f"epoch_us({expr})"


def _json_int(d: Dialect, expr: str, key: str) -> str:
    if d.name == "spark":
        return f"CAST(get_json_object({expr}, '$.{key}') AS INT)"
    return f"CAST(json_extract_string({expr}, '$.{key}') AS INT)"


def events_latest_by_user_sql(d: Dialect) -> str:
    """LWW analog on the events stream: latest event per user."""
    return f"""
SELECT user_id,
  max(event_id) AS last_event_id,
  max_by(event_type, event_id) AS last_event_type,
  max_by(value, event_id) AS last_value,
  max_by({_epoch_us(d, 'ts')}, event_id) AS last_ts_us
FROM events
GROUP BY user_id
""".strip()


def events_type_stats_sql(d: Dialect) -> str:
    return f"""
SELECT event_type,
  count(*) AS n_events,
  count(DISTINCT user_id) AS n_users,
  {d.exact_sum('value')} AS total_value,
  min({_epoch_us(d, 'ts')}) AS first_ts_us,
  max({_epoch_us(d, 'ts')}) AS last_ts_us
FROM events
GROUP BY event_type
""".strip()


def events_windowed_stats_sql(d: Dialect, window_minutes: int = 10) -> str:
    """Tumbling event-time window stats — the BATCH rendering of the
    streaming watermarked aggregation (streaming/windowed.py): the
    bucket arithmetic ``(epoch_us DIV width) * width`` is exactly what
    Spark's ``window()`` computes (epoch-origin tumbling), expressed as
    integer math so DuckDB replays it bit-for-bit. FLOOR division (the
    double-mod normalization below), not truncation — window() floors,
    and the two diverge for pre-1970 timestamps. One map-side-combining
    groupBy; the n_users count(DISTINCT) is the standard two-phase
    expand."""
    us = window_minutes * 60 * 1_000_000
    e = _epoch_us(d, "ts")
    # floor-mod: e - (((e % us) + us) % us) == floor(e/us)*us for any
    # sign of e (both engines' % is truncation-remainder, so normalize)
    bucket = f"({e} - ((({e} % {us}) + {us}) % {us}))"
    return f"""
SELECT {bucket} AS win_start_us, event_type,
  count(*) AS n_events,
  count(DISTINCT user_id) AS n_users,
  {d.exact_sum('value')} AS sum_value
FROM events
GROUP BY {bucket}, event_type
""".strip()


def events_json_extract_sql(d: Dialect) -> str:
    return f"""
SELECT {_json_int(d, 'props', 'k')} AS k,
  count(*) AS n,
  {d.exact_sum('value')} AS total_value
FROM events
GROUP BY {_json_int(d, 'props', 'k')}
""".strip()


def sessionize_sql(d: Dialect, gap_minutes: int = 30) -> str:
    """Gap-based sessionization (streaming session-window analog, done
    batch-side): a >30 min silence starts a new session."""
    gap_us = gap_minutes * 60 * 1_000_000
    ts_us = _epoch_us(d, "ts")
    return f"""
WITH ordered AS (
  SELECT user_id, event_id, {ts_us} AS ts_us,
    lag({ts_us}) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_ts_us
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN prev_ts_us IS NULL OR ts_us - prev_ts_us > {gap_us}
                 THEN 1 ELSE 0 END AS new_session
  FROM ordered
),
sessioned AS (
  SELECT user_id, event_id, ts_us,
    -- BIGINT cast: DuckDB types sum(int) OVER (...) as HUGEINT (int128),
    -- Spark as BIGINT; pin both to BIGINT so value hashes agree
    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq,
  count(*) AS n_events,
  min(ts_us) AS session_start_us,
  max(ts_us) AS session_end_us
FROM sessioned
GROUP BY user_id, session_seq
""".strip()


def running_value_sql(d: Dialect) -> str:
    return f"""
SELECT event_id, user_id,
  CAST(sum(CAST(value AS DECIMAL(28,10))) OVER (
    PARTITION BY user_id ORDER BY event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
FROM events
""".strip()


def topk_users_sql(d: Dialect, k: int = 10) -> str:
    return f"""
SELECT user_id, {d.exact_sum('value')} AS total_value, count(*) AS n_events
FROM events
GROUP BY user_id
ORDER BY total_value DESC, user_id
LIMIT {k}
""".strip()


def pricing_summary_sql(d: Dialect) -> str:
    """TPC-H Q1-style pricing summary with exact decimal arithmetic."""
    return f"""
SELECT l_returnflag, l_linestatus,
  {d.exact_sum('l_quantity')} AS sum_qty,
  {d.exact_sum('l_extendedprice')} AS sum_base_price,
  {d.exact_sum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
  {d.exact_sum('(l_extendedprice * (1 - l_discount)) * (1 + l_tax)')} AS sum_charge,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""".strip()


def nation_revenue_sql(d: Dialect) -> str:
    """Star join: orders ⋈ customer ⋈ nation ⋈ region (dims broadcast)."""
    return f"""
SELECT r_name, n_name,
  count(*) AS n_orders,
  {d.exact_sum('o_totalprice')} AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""".strip()


def order_lineitem_rollup_sql(d: Dialect) -> str:
    """Fact-fact join + per-order rollup + having filter."""
    return f"""
SELECT o_orderkey, o_orderstatus,
  count(*) AS n_lines,
  {d.exact_sum('l_extendedprice * (1 - l_discount)')} AS order_revenue
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderkey, o_orderstatus
HAVING count(*) >= 5
""".strip()


def _runner(sql_builder, tables):
    def run(spark, sf_dir: str):
        return run_sql(spark, sf_dir, sql_builder(SPARK), tables=tables)

    return run


def events_funnel_sql(d: Dialect) -> str:
    """Three-stage conversion funnel over the event stream: first 'view',
    first 'click' strictly after it, first 'purchase' strictly after
    that — per user, then the per-stage user counts and the total
    click→purchase latency. The standard product-analytics query.

    Scale: three user_id-keyed min() aggregates chained by equi-joins —
    every aggregate partial-combines map-side and every join is on the
    (already-shuffled) user_id key, so a 100 TB event log pays one
    user_id shuffle reused across stages; no window over the full
    stream, no self-cross-product.
    """
    t = _epoch_us(d, "ts")
    return f"""
WITH ev AS (SELECT user_id, event_type, {t} AS t_us FROM events),
v AS (
  SELECT user_id, min(t_us) AS t0 FROM ev
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT ev.user_id, min(ev.t_us) AS t1
  FROM ev JOIN v ON ev.user_id = v.user_id AND ev.t_us > v.t0
  WHERE ev.event_type = 'click' GROUP BY ev.user_id
),
p AS (
  SELECT ev.user_id, min(ev.t_us) AS t2
  FROM ev JOIN c ON ev.user_id = c.user_id AND ev.t_us > c.t1
  WHERE ev.event_type = 'purchase' GROUP BY ev.user_id
)
SELECT
  (SELECT count(*) FROM v) AS n_view,
  (SELECT count(*) FROM c) AS n_click_after_view,
  (SELECT count(*) FROM p) AS n_purchase_after_click,
  (SELECT CAST(COALESCE(sum(p.t2 - c.t1), 0) AS BIGINT)
   FROM p JOIN c ON p.user_id = c.user_id) AS total_click_to_purchase_us
""".strip()


def events_retention_sql(d: Dialect) -> str:
    """Cohort retention: users grouped by their first-activity day, then
    for each (cohort_day, day_offset ≤ 30) the count of cohort users
    active that day — the standard growth-analytics matrix.

    Scale: day-grain DISTINCT first (shuffled rows ∝ user-days, not
    events, and it partial-combines map-side), cohorts as a
    user_id-keyed min() over THAT output (re-uses nothing wide), join
    back on user_id, final small groupBy. At 100 TB the event-level
    scan collapses to user-day grain before anything wide happens.

    Days are integer epoch-day indexes (``epoch_us DIV 86400e6``, the
    same tz-independent arithmetic as events_windowed_stats) — never a
    session-timezone-dependent ``CAST(ts AS DATE)``; the cohort day is
    rendered back to a date string only at output.
    """
    day_idx = d.idiv(_epoch_us(d, "ts"), "86400000000")
    if d.name == "spark":
        render = "CAST(date_add(DATE '1970-01-01', CAST(c.cohort_idx AS INT)) AS STRING)"
    else:
        render = "CAST(DATE '1970-01-01' + CAST(c.cohort_idx AS INT) AS VARCHAR)"
    return f"""
WITH activity AS (
  SELECT DISTINCT user_id, {day_idx} AS day_idx FROM events
),
cohorts AS (
  SELECT user_id, MIN(day_idx) AS cohort_idx FROM activity GROUP BY user_id
)
SELECT {render} AS cohort_day,
  CAST(a.day_idx - c.cohort_idx AS INT) AS day_offset,
  count(*) AS n_users
FROM activity a JOIN cohorts c ON a.user_id = c.user_id
WHERE a.day_idx - c.cohort_idx <= 30
GROUP BY c.cohort_idx, a.day_idx - c.cohort_idx
""".strip()


def events_anomaly_sql(d: Dialect, min_events: int = 5, z_cut: int = 2) -> str:
    """Per-user z-score outlier detection over ``events.value`` — the
    metric-anomaly sweep a pipeline runs before trusting ingested
    telemetry as training signal.

    Determinism across engines: the per-user moments are ORDER-FREE
    exact-decimal sums (``exact_sum``); mean/variance/z are then a fixed
    IEEE-754 expression tree over those exact inputs, so Spark and DuckDB
    produce bit-identical doubles (a plain float SUM would be
    order-dependent and break the oracle hash). A tiny variance can
    round NEGATIVE after the decimal quantization (e.g. constant values
    whose square underflows the DECIMAL scale); DuckDB's sqrt() throws
    on a negative radicand where Spark returns NaN, so the radicand is
    clamped with greatest(var, 0) — the resulting std_v = 0 rows are
    then excluded by ``std_v > 0``.

    Scale: one map-side-combining groupBy for the moments (shuffled rows
    ∝ users), then a user-keyed join back — at 100 TB the stats side is
    tiny relative to events and AQE picks a broadcast when it fits;
    output rows ∝ anomalies only.
    """
    return f"""
WITH stats AS (
  SELECT user_id, count(*) AS n,
    {d.exact_sum('value')} AS sum_v,
    {d.exact_sum('value * value')} AS sum_sq
  FROM events
  GROUP BY user_id
  HAVING count(*) >= {min_events}
),
scored AS (
  SELECT e.event_id, e.user_id, e.value,
    s.sum_v / s.n AS mean_v,
    sqrt(greatest((s.sum_sq - s.sum_v * s.sum_v / s.n) / s.n, 0)) AS std_v
  FROM events e JOIN stats s ON e.user_id = s.user_id
)
SELECT event_id, user_id, value, mean_v, std_v,
  (value - mean_v) / std_v AS zscore
FROM scored
WHERE std_v > 0 AND abs(value - mean_v) > {z_cut} * std_v
""".strip()


QUERIES = {
    "cdc_events_latest_by_user": (
        _runner(events_latest_by_user_sql, ("events",)),
        events_latest_by_user_sql(DUCKDB),
    ),
    "cdc_events_type_stats": (
        _runner(events_type_stats_sql, ("events",)),
        events_type_stats_sql(DUCKDB),
    ),
    "events_json_extract": (
        _runner(events_json_extract_sql, ("events",)),
        events_json_extract_sql(DUCKDB),
    ),
    "events_windowed_stats": (
        _runner(events_windowed_stats_sql, ("events",)),
        events_windowed_stats_sql(DUCKDB),
    ),
    "events_sessionize": (_runner(sessionize_sql, ("events",)), sessionize_sql(DUCKDB)),
    "events_running_value": (
        _runner(running_value_sql, ("events",)),
        running_value_sql(DUCKDB),
    ),
    "events_topk_users": (_runner(topk_users_sql, ("events",)), topk_users_sql(DUCKDB)),
    "events_funnel": (_runner(events_funnel_sql, ("events",)), events_funnel_sql(DUCKDB)),
    "events_retention": (
        _runner(events_retention_sql, ("events",)),
        events_retention_sql(DUCKDB),
    ),
    "events_anomaly": (
        _runner(events_anomaly_sql, ("events",)),
        events_anomaly_sql(DUCKDB),
    ),
    "agg_pricing_summary": (
        _runner(pricing_summary_sql, ("lineitem",)),
        pricing_summary_sql(DUCKDB),
    ),
    "join_nation_revenue": (
        _runner(nation_revenue_sql, ("orders", "customer", "nation", "region")),
        nation_revenue_sql(DUCKDB),
    ),
    "join_order_rollup": (
        _runner(order_lineitem_rollup_sql, ("orders", "lineitem")),
        order_lineitem_rollup_sql(DUCKDB),
    ),
}
