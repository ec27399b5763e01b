"""Bloom-filter pre-filtered semi-join (operators/bloomjoin.py)."""

from __future__ import annotations

import duckdb
import pytest

from pypgoutput_spark.operators import bloomjoin as bj

SF_DIR = "/root/testdata/sf0.01"


def test_no_false_negatives_and_prunes(spark):
    """Every built key passes the probe; keys far outside the built set
    are pruned at (better than) the designed false-positive rate."""
    keys = spark.range(0, 1000).selectExpr("id * 7 AS k")
    n_bits = bj.bloom_size_bits(1000)
    words = bj.bloom_build_words(keys, "k", n_bits, 6)
    assert len(words) == n_bits // 64

    from pyspark.sql import functions as F

    probe = (
        spark.range(0, 100000)
        .selectExpr("id + 1000000 AS k")  # disjoint from the built keys
        .unionByName(keys)
        .withColumn("__w", F.lit(words).cast("array<bigint>"))
    )
    kept = probe.where(
        bj.bloom_probe_predicate("k", "__w", n_bits, 6)
    ).select("k")
    kept_set = {r[0] for r in kept.collect()}
    # zero false negatives
    assert all(i * 7 in kept_set for i in range(1000))
    # false positives bounded: 16 bits/key pow2-rounded, 6 hashes → well
    # under 2% of the 100k disjoint probes
    n_fp = len(kept_set) - 1000
    assert n_fp < 2000, n_fp


def test_bloom_semi_join_exact(spark):
    """bloom_semi_join ≡ plain left-semi join (FPs removed by verify)."""
    left = spark.range(0, 5000).selectExpr("id AS k", "id % 97 AS payload")
    right = spark.range(0, 5000).where("id % 13 = 0").selectExpr("id AS rk")
    got, words = bj.bloom_semi_join(left, "k", right, "rk")
    expect = left.join(right, left["k"] == right["rk"], "left_semi")
    assert sorted(r[0] for r in got.collect()) == sorted(
        r[0] for r in expect.collect()
    )
    assert any(w != 0 for w in words)


def test_bloom_semi_join_mixed_numeric_key_types_exact(spark):
    """Int build keys vs double probe keys: CAST-AS-STRING renders '5'
    vs '5.0', so unnormalized hashing would bloom-drop every genuine
    match (a silent false negative BEFORE the exact join). The
    DECIMAL(38,0) normalization must keep the join exact."""
    left = spark.range(0, 2000).selectExpr("CAST(id AS DOUBLE) AS k")
    right = spark.range(0, 2000).where("id % 11 = 0").selectExpr(
        "CAST(id AS BIGINT) AS rk"
    )
    got, _ = bj.bloom_semi_join(left, "k", right, "rk")
    expect = left.join(right, left["k"] == right["rk"], "left_semi")
    assert sorted(r[0] for r in got.collect()) == sorted(
        r[0] for r in expect.collect()
    )
    # fractional probe values are never equal to an integral build key;
    # they may round into a bloom false positive but must not survive
    frac = spark.range(0, 500).selectExpr("id + 0.5 AS k")
    got2, _ = bj.bloom_semi_join(frac, "k", right, "rk")
    assert got2.count() == 0
    # beyond 2^53 the join's own BIGINT=DOUBLE equality coerces through
    # double (2^53+1 == double(2^53)), so the bloom must hash the SAME
    # coercion — a finer rendering (decimal/exact) would bloom-drop a
    # row the exact join returns
    big_build = spark.createDataFrame(
        [(2**53 + 1,), (2**53 + 3,)], schema="rk BIGINT")
    big_probe = spark.createDataFrame(
        [(float(2**53),), (123.0,)], schema="k DOUBLE")
    got3, _ = bj.bloom_semi_join(big_probe, "k", big_build, "rk")
    expect3 = big_probe.join(
        big_build, big_probe["k"] == big_build["rk"], "left_semi")
    assert sorted(r[0] for r in got3.collect()) == sorted(
        r[0] for r in expect3.collect())
    assert got3.count() == expect3.count() > 0


def test_bloom_semi_join_non_numeric_type_mismatch_raises(spark):
    """A string-vs-int key mismatch has no safe common rendering — the
    operator must refuse loudly instead of silently mis-filtering."""
    left = spark.range(0, 10).selectExpr("CAST(id AS STRING) AS k")
    right = spark.range(0, 10).selectExpr("id AS rk")
    with pytest.raises(ValueError, match="not both numeric"):
        bj.bloom_semi_join(left, "k", right, "rk")


def test_probe_predicate_is_codegen_not_lambda(spark):
    """The probe must compile as plain codegen'd expressions — no
    higher-order-function (interpreted) nodes in the plan."""
    n_bits = 1024
    pred = bj.bloom_probe_predicate("k", "__w", n_bits, 6)
    assert "->" not in pred and "forall" not in pred and "exists" not in pred

    from pyspark.sql import functions as F

    df = (
        spark.range(10)
        .selectExpr("id AS k")
        .withColumn("__w", F.lit([0] * (n_bits // 64)).cast("array<bigint>"))
        .where(pred)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # codegen'd stages print as "*(n)" in the plan; the Filter with the
    # unrolled bit tests must sit inside one
    assert "*(1) Filter" in plan, plan


def test_entry_matches_oracle(spark):
    got = (
        bj.q_join_bloom_semijoin(spark, SF_DIR)
        .orderBy("o_orderpriority")
        .collect()
    )
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    want = con.sql(
        bj.building_orders_sql(bj.DUCKDB) + " ORDER BY o_orderpriority"
    ).fetchall()
    assert len(got) == len(want) and len(got) > 0
    for g, w in zip(got, want):
        assert g[0] == w[0]
        assert g[1] == w[1]
        assert g[2] == pytest.approx(w[2], rel=1e-12)


def test_string_keys_actually_prune(spark):
    """Non-integral keys must still PRUNE: hashing CAST(key AS BIGINT)
    NULLed every string/uuid key, so all build keys set the same bits
    and the filter passed everything — correct results, zero pruning,
    nothing flagged. The hash input is CAST(key AS STRING) now."""
    from pyspark.sql import functions as F

    keys = spark.range(0, 500).selectExpr("concat('uuid-', id) AS k")
    n_bits = bj.bloom_size_bits(500)
    words = bj.bloom_build_words(keys, "k", n_bits, 6)
    probe = (
        spark.range(0, 50000)
        .selectExpr("concat('other-', id) AS k")  # disjoint
        .unionByName(keys)
        .withColumn("__w", F.lit(words).cast("array<bigint>"))
    )
    kept = {r[0] for r in probe.where(
        bj.bloom_probe_predicate("k", "__w", n_bits, 6)).collect()}
    assert all(f"uuid-{i}" in kept for i in range(500))  # no false negs
    n_fp = len(kept) - 500
    assert n_fp < 1000, f"string keys are not pruning (fp={n_fp})"
    # int-vs-bigint build/probe columns share one hash domain via STRING
    ikeys = spark.range(0, 100).selectExpr("CAST(id AS INT) AS k")
    iwords = bj.bloom_build_words(ikeys, "k", n_bits, 6)
    iprobe = (spark.range(0, 100).selectExpr("id AS k")  # BIGINT probe
              .withColumn("__w", F.lit(iwords).cast("array<bigint>")))
    n_kept = iprobe.where(
        bj.bloom_probe_predicate("k", "__w", n_bits, 6)).count()
    assert n_kept == 100  # every int key found via its bigint spelling
