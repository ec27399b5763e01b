"""Bloom-filter pre-filtered semi-join — the large×large shuffle saver.

The reference has no joins at all (SURVEY §2.2: its one key lookup is a
driver-side dict); this operator covers the pattern every 100 TB star
join needs when the build side's KEY SET is too big to broadcast but a
few megabits of bloom bits are not: TPC-H Q3's "orders of BUILDING
customers" shape. A plain shuffle semi-join moves EVERY probe-side row
across the network; Spark's own runtime bloom
(``spark.sql.optimizer.runtime.bloomFilter.enabled``, InjectRuntimeFilter)
covers some shuffle joins automatically, but is planner-heuristic and
its ``might_contain``/``bloom_filter_agg`` expressions are not callable
from public SQL (verified on this build: UNRESOLVED_ROUTINE). This is
the explicit, always-available form:

1. **Build** (distributed): each build key sets ``n_hashes`` bits of an
   ``n_bits``-wide filter; the bit positions are ``pmod(xxhash64(key, i),
   n_bits)``; the filter materializes as ``n_bits/64`` BIGINT words via
   one map-side-combining ``bit_or`` aggregate over word index — traffic
   is O(words × partitions), never O(keys).
2. **Probe** (codegen'd, zero extra shuffle): the words ship to the
   probe scan as ONE array literal (the same broadcast-tiny-state move
   as the IVF centroids); each probe row evaluates ``n_hashes`` unrolled
   JVM bit tests — no higher-order-function interpretation, no Python.
3. **Exactness**: the bloom only PRUNES; survivors (true matches + the
   ~``0.5^n_hashes``-rate false positives) still pass through the exact
   semi-join, so results are bit-identical to the un-bloomed query —
   which is exactly what the DuckDB oracle runs.

Scale accounting: with the default 16 bits/key the words array is
~2 MB per million build keys — driver-collected and replanned per
query, fine through ~10M keys. Beyond that, keep the words as a
DataFrame and broadcast-join the probe side on word index instead of
inlining a literal (same math, one more broadcast); the collect here is
deliberate so the probe filter stays a pure codegen'd scan predicate.
"""

from __future__ import annotations

from pypgoutput_spark.functions.detsql import DUCKDB, SPARK, Dialect


def _pos(key_sql: str, seed, n_bits: int) -> str:
    """Bit position of hash ``seed`` for ``key_sql`` (non-negative).

    Hashes ``CAST(key AS STRING)``: a BIGINT cast would NULL out every
    non-integral key (string/uuid), making xxhash64 hash only the seed —
    all build keys set the same bits and the filter silently passes
    everything (or, under ANSI mode, the cast throws). The string form
    also normalizes int-vs-bigint build/probe columns to one hash
    domain."""
    return f"pmod(xxhash64(CAST({key_sql} AS STRING), {seed}), {n_bits})"


def bloom_build_words(keys_df, key_col: str, n_bits: int, n_hashes: int):
    """Distributed bloom build → dense Python list of ``n_bits // 64``
    signed int64 words (missing words zero-filled). One explode(seeds) →
    one ``bit_or`` groupBy on word index; both partial-aggregate
    map-side, so per-key traffic never leaves its partition."""
    assert n_bits % 64 == 0 and n_bits > 0, n_bits
    pos = _pos(key_col, "s", n_bits)
    words_df = (
        keys_df.selectExpr(
            f"explode(sequence(0, {n_hashes - 1})) AS s", key_col
        )
        .selectExpr(
            f"CAST(shiftright({pos}, 6) AS INT) AS w",
            f"shiftleft(CAST(1 AS BIGINT), CAST(pmod({pos}, 64) AS INT)) AS bit",
        )
        .groupBy("w")
        .agg({"bit": "bit_or"})
    )
    words = [0] * (n_bits // 64)
    for row in words_df.collect():
        words[row[0]] = row[1]
    return words


def bloom_probe_predicate(key_sql: str, words_col: str, n_bits: int,
                          n_hashes: int) -> str:
    """SQL predicate: all ``n_hashes`` bits set for ``key_sql`` in the
    filter carried by array column ``words_col``. Unrolled (not a
    higher-order lambda — those are interpreted per element, not
    codegen'd); the duplicate position subexpression inside each test is
    eliminated by codegen subexpression elimination."""
    tests = []
    for i in range(n_hashes):
        pos = _pos(key_sql, i, n_bits)
        word = f"element_at({words_col}, CAST(shiftright({pos}, 6) AS INT) + 1)"
        tests.append(
            f"((shiftright({word}, CAST(pmod({pos}, 64) AS INT)) & 1) = 1)"
        )
    return "(" + " AND ".join(tests) + ")"


def bloom_size_bits(n_keys: int, bits_per_key: int = 16,
                    min_bits: int = 1024) -> int:
    """Power-of-two filter width ≥ bits_per_key × n_keys. At 16 bits/key
    with 6 hashes the false-positive rate is ~0.2–0.9% depending on the
    rounding slack — pruning quality, not correctness (step 3 above)."""
    n = max(min_bits, bits_per_key * max(n_keys, 1))
    bits = 1 << (n - 1).bit_length()
    return bits


def bloom_semi_join(probe_df, probe_key: str, keys_df, build_key: str,
                    n_hashes: int = 6, bits_per_key: int = 16):
    """``probe_df`` rows whose ``probe_key`` appears in ``keys_df``'s
    ``build_key`` — exact (bloom prunes, the semi-join verifies).
    Returns (filtered_df, words) — words exposed so tests can pin the
    filter's pruning behavior.

    Mixed-type keys: the hash renders ``CAST(key AS STRING)``, and an
    int build key spells '5' while a double probe value spells '5.0' —
    a silent false NEGATIVE (the bloom drops a genuinely matching row
    before the exact join ever sees it). When the two key dtypes differ
    and both are numeric, both sides are therefore hashed through
    ``CAST(key AS DOUBLE)`` — the join's own mixed-numeric equality
    coerces through (at most) double, so two values the exact join
    would call equal always render the same double string: no false
    negatives BY CONSTRUCTION, for every numeric pairing including
    bigint values beyond 2^53 (where a decimal rendering would be finer
    than the join's own coercion and silently drop matches). Distinct
    values that collide at double precision are false POSITIVES, which
    the exact join removes. A non-numeric dtype mismatch has no safe
    common rendering and raises instead of silently mis-filtering."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import NumericType

    build_t = keys_df.schema[build_key].dataType
    probe_t = probe_df.schema[probe_key].dataType
    build_hash_df = keys_df.select(build_key)
    probe_hash_sql = probe_key
    if build_t != probe_t:
        if not (isinstance(build_t, NumericType)
                and isinstance(probe_t, NumericType)):
            raise ValueError(
                "bloom_semi_join: build/probe key dtypes differ and are "
                f"not both numeric ({build_t.simpleString()} vs "
                f"{probe_t.simpleString()}): CAST-AS-STRING hashing would "
                "silently drop matches; cast the columns to one type first"
            )
        build_hash_df = keys_df.selectExpr(
            f"CAST({build_key} AS DOUBLE) AS {build_key}")
        probe_hash_sql = f"CAST({probe_key} AS DOUBLE)"
    keys = keys_df.select(build_key).distinct()
    n_bits = bloom_size_bits(keys.count(), bits_per_key)
    words = bloom_build_words(
        build_hash_df.distinct(), build_key, n_bits, n_hashes)

    pre = (
        probe_df.withColumn("__bloom_words", F.lit(words).cast("array<bigint>"))
        .where(bloom_probe_predicate(
            probe_hash_sql, "__bloom_words", n_bits, n_hashes))
        .drop("__bloom_words")
    )
    out = pre.join(keys, pre[probe_key] == keys[build_key], "left_semi")
    return out, words


def building_orders_sql(d: Dialect) -> str:
    """The oracle (and the semantics): revenue of orders placed by
    BUILDING-segment customers, per order priority — the TPC-H Q3
    selective-dimension shape."""
    return f"""
SELECT o_orderpriority,
  count(*) AS n_orders,
  {d.exact_sum('o_totalprice')} AS revenue
FROM orders
WHERE o_custkey IN (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
)
GROUP BY o_orderpriority
""".strip()


def q_join_bloom_semijoin(spark, sf_dir: str):
    """Spark side of :func:`building_orders_sql`, but the orders scan is
    bloom-pre-filtered before the exact semi-join (module docstring)."""
    from pyspark.sql import functions as F

    from pypgoutput_spark.operators.qlib import register_views

    register_views(spark, sf_dir, tables=("orders", "customer"))
    orders = spark.table("orders")
    keys = spark.table("customer").where("c_mktsegment = 'BUILDING'")
    matched, _words = bloom_semi_join(orders, "o_custkey", keys, "c_custkey")
    return matched.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.expr(SPARK.exact_sum("o_totalprice")).alias("revenue"),
    )


QUERIES = {
    "join_bloom_semijoin": (q_join_bloom_semijoin, building_orders_sql(DUCKDB)),
}
