"""Deterministic sketch operators — cardinality and quantile estimation.

At 100 TB, exact `count(DISTINCT)` and exact global quantiles are
shuffle-heavy (the distinct shuffle moves every unique value; an exact
quantile sorts the world). Production engines answer with mergeable
sketches — HLL for cardinality, KLL/t-digest for quantiles. Those
sketches are RANDOMIZED and engine-specific, so they cannot be
oracle-verified across engines; these operators implement their
deterministic md5-derived cousins with bit-identical results in Spark
and DuckDB, verifying the *estimator arithmetic* end to end:

  - KMV (k-minimum-values) distinct estimation: hash every value to a
    uniform 60-bit integer, keep the k smallest per group, estimate
    D ≈ (k-1)·2^60 / h_k (integer division — exact in both engines).
    Production form: the k-min set is a mergeable bounded sketch
    (per-partition k smallest, merge-combine); the SQL rendering here
    reaches the same numbers through a rank window, which is the
    verification harness, not the 100 TB plan. Spark's native
    production path is `approx_count_distinct` (HLL++), whose error
    the test suite compares against this estimator.
  - Bottom-k sampled quantiles: a deterministic fixed-size sample per
    group (the k rows with the smallest md5(doc_id) draws — stable
    under resharding and engine choice), then exact nearest-rank
    quantiles WITHIN the sample. The sample is the bounded-memory
    object a 100 TB job would actually ship to the driver; accuracy
    follows the usual ±O(1/√k) sampling bound (test-pinned against the
    exact quantiles).

Reference scope note: the reference pipeline (dgea005/pypgoutput) stops
at decoded change events; sketches are part of the downstream analytics
surface this engine adds (same scope note as operators/asof.py).
"""

from __future__ import annotations

from pypgoutput_spark.functions.detsql import DUCKDB, SPARK, Dialect
from pypgoutput_spark.operators.qlib import run_sql

#: KMV sketch size (estimate error ~ 1/sqrt(K) ≈ 12.5%)
KMV_K = 64
#: bottom-k sample size per group for quantile estimation
SAMPLE_K = 256
#: hash-space modulus: 54 bits so (KMV_K - 1) * HASH_M stays inside
#: INT64 (63 * 2^54 < 2^60) — the estimator is pure BIGINT arithmetic
HASH_M = 1 << 54


def kmv_distinct_sql(d: Dialect, k: int = KMV_K) -> str:
    """Per-source distinct-content cardinality: exact count and the KMV
    estimate from the k-th smallest content hash. Groups with fewer than
    k distinct values fall back to the exact count (the sketch has seen
    everything)."""
    hv = f"({d.md5_int('text')} % {HASH_M})"
    return f"""
WITH h AS (
  SELECT DISTINCT source, {hv} AS hv
  FROM documents WHERE n_chars > 0
),
ranked AS (
  SELECT source, hv,
    row_number() OVER (PARTITION BY source ORDER BY hv) AS rn
  FROM h
),
kth AS (SELECT source, hv AS h_k FROM ranked WHERE rn = {k}),
exact AS (SELECT source, count(*) AS exact_distinct FROM h GROUP BY source)
SELECT e.source,
  CAST(e.exact_distinct AS BIGINT) AS exact_distinct,
  CAST(COALESCE({d.idiv(f"({k} - 1) * CAST({HASH_M} AS BIGINT)", "NULLIF(kth.h_k, 0)")},
       e.exact_distinct) AS BIGINT) AS kmv_estimate
FROM exact e LEFT JOIN kth ON kth.source = e.source
""".strip()


def sample_quantiles_sql(d: Dialect, k: int = SAMPLE_K) -> str:
    """Per-source token-count quantiles from a deterministic bottom-k
    sample (smallest md5(doc_id) draws), nearest-rank within the sample
    — plus the exact quantiles from the full group for error
    visibility. Both are positional (rank = ceil(q·n), doc_id
    tiebreak), so the output is bit-identical across engines."""
    toks = f"{d.array_len(d.split_ws('text'))}"
    draw = f"({d.md5_int(d.s('doc_id'))} % {HASH_M})"

    def nearest_rank(src: str, q_num: int, q_den: int, n_col: str) -> str:
        # rank ceil(q*n) with integer arithmetic: (q_num*n + q_den - 1) div q_den
        return f"{d.idiv(f'({q_num} * {src}.{n_col} + {q_den} - 1)', str(q_den))}"

    return f"""
WITH t AS (
  SELECT doc_id, source, CAST({toks} AS BIGINT) AS n_tok, {draw} AS draw
  FROM documents WHERE n_chars > 0
),
sampled AS (
  SELECT source, doc_id, n_tok FROM (
    SELECT source, doc_id, n_tok,
      row_number() OVER (PARTITION BY source ORDER BY draw, doc_id) AS srn
    FROM t
  ) WHERE srn <= {k}
),
s_ranked AS (
  SELECT source, n_tok,
    row_number() OVER (PARTITION BY source ORDER BY n_tok, doc_id) AS rn,
    count(*) OVER (PARTITION BY source) AS n
  FROM sampled
),
f_ranked AS (
  SELECT source, n_tok,
    row_number() OVER (PARTITION BY source ORDER BY n_tok, doc_id) AS rn,
    count(*) OVER (PARTITION BY source) AS n
  FROM t
),
s_q AS (
  SELECT source,
    max(n) AS sample_n,
    max(CASE WHEN rn = {nearest_rank('s_ranked', 1, 2, 'n')} THEN n_tok END) AS q50_sample,
    max(CASE WHEN rn = {nearest_rank('s_ranked', 9, 10, 'n')} THEN n_tok END) AS q90_sample
  FROM s_ranked GROUP BY source
),
f_q AS (
  SELECT source,
    max(CASE WHEN rn = {nearest_rank('f_ranked', 1, 2, 'n')} THEN n_tok END) AS q50_exact,
    max(CASE WHEN rn = {nearest_rank('f_ranked', 9, 10, 'n')} THEN n_tok END) AS q90_exact
  FROM f_ranked GROUP BY source
)
SELECT s_q.source, sample_n, q50_sample, q90_sample, q50_exact, q90_exact
FROM s_q JOIN f_q ON f_q.source = s_q.source
""".strip()


#: union-sketch size: smaller than KMV_K so the estimator genuinely
#: engages at the correctness scale (sf0.01: ~25 distinct contents per
#: source, ~50 per pairwise union); error band widens to ~1/sqrt(16) = 25%
KMV_UNION_K = 16


def kmv_union_sql(d: Dialect, k: int = KMV_UNION_K) -> str:
    """Sketch ALGEBRA — the property that makes sketches the 100 TB
    answer: per-source KMV sketches (k smallest content hashes, a
    bounded mergeable object) are MERGED pairwise to estimate each
    source pair's union, intersection (inclusion–exclusion) and Jaccard
    — without ever touching the full corpus again. The exact values
    ride along for error visibility: computing them needs the full
    distinct-hash self-join this sketch exists to avoid.

    Merging = bottom-k of the two sketches' union — exactly how
    per-partition / per-day / per-source sketches combine upward in a
    production rollup. Pairs whose true union is smaller than k fall
    back to the exact union (the merged sketch saw everything).
    Everything is BIGINT arithmetic or one exactly-rounded division —
    bit-identical across engines.

    Plan note: every join over SKETCH or HASH rows is an equi-join
    (the sketch-to-pair attach is two equi-joins unioned, never an OR
    predicate — Spark would plan that as BroadcastNestedLoop); the only
    nested-loop is the pair enumeration itself over the n_sources-row
    name list, which is O(n²) by definition and broadcast-tiny.
    """
    hv = f"({d.md5_int('text')} % {HASH_M})"
    est = f"{d.idiv(f'({k} - 1) * CAST({HASH_M} AS BIGINT)', 'NULLIF(h_k, 0)')}"
    return f"""
WITH h AS (
  SELECT DISTINCT source, {hv} AS hv
  FROM documents WHERE n_chars > 0
),
sk AS (
  SELECT source, hv, rn FROM (
    SELECT source, hv,
      row_number() OVER (PARTITION BY source ORDER BY hv) AS rn
    FROM h
  ) r WHERE rn <= {k}
),
src_kth AS (
  SELECT source, max(CASE WHEN rn = {k} THEN hv END) AS h_k
  FROM sk GROUP BY source
),
src_exact AS (SELECT source, count(*) AS n_exact FROM h GROUP BY source),
src_est AS (
  SELECT e.source,
    CAST(COALESCE({est}, e.n_exact) AS BIGINT) AS d_est,
    e.n_exact
  FROM src_exact e JOIN src_kth t ON t.source = e.source
),
pairs AS (
  SELECT a.source AS src_a, b.source AS src_b
  FROM src_exact a JOIN src_exact b ON a.source < b.source
),
merged AS (
  -- two broadcast equi-joins, never an OR predicate (Spark plans an
  -- OR-join as BroadcastNestedLoop — the wrong shape at any scale)
  SELECT src_a, src_b, hv,
    row_number() OVER (PARTITION BY src_a, src_b ORDER BY hv) AS rn
  FROM (
    SELECT DISTINCT src_a, src_b, hv FROM (
      SELECT p.src_a, p.src_b, s.hv FROM pairs p JOIN sk s ON s.source = p.src_a
      UNION ALL
      SELECT p.src_a, p.src_b, s.hv FROM pairs p JOIN sk s ON s.source = p.src_b
    ) uu
  ) u
),
u_kth AS (
  SELECT src_a, src_b, max(CASE WHEN rn = {k} THEN hv END) AS h_k
  FROM merged GROUP BY src_a, src_b
),
exact_inter AS (
  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_inter
  FROM h a JOIN h b ON a.hv = b.hv AND a.source < b.source
  GROUP BY a.source, b.source
),
ex AS (
  SELECT p.src_a, p.src_b,
    ea.n_exact + eb.n_exact - COALESCE(i.n_inter, 0) AS exact_union,
    COALESCE(i.n_inter, 0) AS exact_inter
  FROM pairs p
  JOIN src_exact ea ON ea.source = p.src_a
  JOIN src_exact eb ON eb.source = p.src_b
  LEFT JOIN exact_inter i ON i.src_a = p.src_a AND i.src_b = p.src_b
)
SELECT ex.src_a, ex.src_b,
  CAST(ex.exact_union AS BIGINT) AS exact_union,
  CAST(ex.exact_inter AS BIGINT) AS exact_inter,
  CAST(COALESCE({est}, ex.exact_union) AS BIGINT) AS union_est,
  CAST(greatest(CAST(0 AS BIGINT),
    sa.d_est + sb.d_est - COALESCE({est}, ex.exact_union)) AS BIGINT) AS inter_est
FROM ex
JOIN u_kth u ON u.src_a = ex.src_a AND u.src_b = ex.src_b
JOIN src_est sa ON sa.source = ex.src_a
JOIN src_est sb ON sb.source = ex.src_b
""".strip()


#: count-min sketch geometry: D independent hash rows × W buckets.
#: Overcount bound: est ≤ true + e·N/W per row (min over D rows); W must
#: scale with the live item count — at ~1.5 items/bucket the min over 4
#: rows is almost always exact (test-pinned)
CMS_D = 4
CMS_W = 1024


def cms_heavy_hitters_sql(d: Dialect, n_rows: int = CMS_D, width: int = CMS_W,
                          num: int = 6, den: int = 5) -> str:
    """Heavy hitters via a count-min sketch (Cormode & Muthukrishnan):
    every event increments one bucket per hash row; an item's estimate
    is the MIN of its D bucket counters — always ≥ the true count, over
    by at most the bucket's collision mass. Output: users whose
    estimated event count is ≥ ``num/den`` × the per-user mean.

    Scale: the sketch is ``D × W`` mergeable integer counters — a
    map-side-combining groupBy whose output size is FIXED regardless of
    event count (the whole point vs an exact per-user groupBy whose
    shuffle grows with the key space); the probe side joins candidates
    against the broadcast-sized sketch. Here the candidate set is all
    distinct users (the verification harness); a 100 TB deployment
    probes a bounded candidate stream (e.g. per-partition local heavy
    hitters) against the same sketch. Everything is md5-derived integer
    arithmetic — bit-identical in both engines, so the oracle verifies
    the estimator end to end.
    """
    js = d.unnest(d.sequence("0", str(n_rows - 1)))

    def bucket(j_expr: str, user_expr: str) -> str:
        key = f"concat('cms:', {d.s(j_expr)}, ':', {d.s(user_expr)})"
        return f"({d.md5_int(key)} % {width})"

    return f"""
WITH rows_j AS (
  SELECT user_id, {js} AS j FROM events
),
sketch AS (
  SELECT j, {bucket('j', 'user_id')} AS b, count(*) AS c
  FROM rows_j GROUP BY j, {bucket('j', 'user_id')}
),
probe AS (
  SELECT u.user_id, js.j,
    {bucket('js.j', 'u.user_id')} AS b
  FROM (SELECT DISTINCT user_id FROM events) u
  CROSS JOIN (SELECT {js} AS j) js
),
est AS (
  SELECT p.user_id, min(s.c) AS est_count
  FROM probe p JOIN sketch s ON p.j = s.j AND p.b = s.b
  GROUP BY p.user_id
),
tot AS (SELECT count(*) AS n, count(DISTINCT user_id) AS u FROM events)
SELECT e.user_id, e.est_count
FROM est e CROSS JOIN tot
WHERE e.est_count * tot.u * {den} >= tot.n * {num}
""".strip()


def _runner(sql_builder, tables=("documents",)):
    def run(spark, sf_dir: str):
        return run_sql(spark, sf_dir, sql_builder(SPARK), tables=tables,
                       spread=("documents",))

    return run


QUERIES = {
    "sketch_kmv_distinct": (_runner(kmv_distinct_sql), kmv_distinct_sql(DUCKDB)),
    "sketch_sample_quantiles": (
        _runner(sample_quantiles_sql), sample_quantiles_sql(DUCKDB),
    ),
    "sketch_kmv_union": (_runner(kmv_union_sql), kmv_union_sql(DUCKDB)),
    "sketch_cms_heavy_hitters": (
        _runner(cms_heavy_hitters_sql, tables=("events",)),
        cms_heavy_hitters_sql(DUCKDB),
    ),
}
