"""Sketch estimator accuracy + funnel semantics.

The cross-engine hash match (driver oracle) proves both engines compute
the same numbers; these tests prove the numbers are GOOD — the KMV
estimate lands within its ~1/sqrt(K) band (and is compared against
Spark's production HLL++), sampled quantiles track the exact ones, and
the funnel counts exactly the strictly-ordered stage sequences."""

from __future__ import annotations

import duckdb
import pytest

from pypgoutput_spark.functions.detsql import DUCKDB
from pypgoutput_spark.operators import sketches as SK
from pypgoutput_spark.operators.analytics import events_funnel_sql

SF = "/root/testdata/sf0.01"


def _docs_con():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    return con


def test_kmv_estimate_within_band():
    df = _docs_con().execute(SK.kmv_distinct_sql(DUCKDB)).df()
    assert len(df) > 0
    for r in df.itertuples(index=False):
        if r.exact_distinct < SK.KMV_K:
            assert r.kmv_estimate == r.exact_distinct  # sketch saw everything
        else:
            rel = abs(r.kmv_estimate - r.exact_distinct) / r.exact_distinct
            # ~4 sigma of the 1/sqrt(64) = 12.5% standard error
            assert rel < 0.5, (r.source, r.exact_distinct, r.kmv_estimate)


def test_kmv_comparable_to_spark_hll(spark):
    """Spark's production estimator (approx_count_distinct, HLL++) and
    the deterministic KMV land in the same neighborhood of the exact
    count — evidence the KMV entry is a faithful stand-in for the
    engine-native sketch it verifies the arithmetic of."""
    from pypgoutput_spark.operators.qlib import register_views

    register_views(spark, SF, ("documents",))
    hll = {
        r["source"]: r["est"]
        for r in spark.sql(
            "SELECT source, approx_count_distinct(text) AS est "
            "FROM documents WHERE n_chars > 0 GROUP BY source"
        ).collect()
    }
    kmv = _docs_con().execute(SK.kmv_distinct_sql(DUCKDB)).df()
    for r in kmv.itertuples(index=False):
        assert abs(hll[r.source] - r.exact_distinct) / r.exact_distinct < 0.5
        assert abs(r.kmv_estimate - r.exact_distinct) / r.exact_distinct < 0.5


def test_sample_quantiles_track_exact():
    df = _docs_con().execute(SK.sample_quantiles_sql(DUCKDB)).df()
    assert len(df) > 0
    for r in df.itertuples(index=False):
        assert r.sample_n <= SK.SAMPLE_K
        # sampled medians within 25% of exact (generous vs 1/sqrt(256))
        assert abs(r.q50_sample - r.q50_exact) <= max(3, 0.25 * r.q50_exact)
        assert abs(r.q90_sample - r.q90_exact) <= max(3, 0.25 * r.q90_exact)
        assert r.q50_sample <= r.q90_sample


def test_funnel_crafted_fixture(spark, tmp_path):
    """Exact stage semantics on a hand-built event log: strictly-after
    ordering, one count per user per stage, no credit for out-of-order
    conversions."""
    rows = [
        # u1: full funnel in order
        (1, "2024-01-01 00:00:00", 1, "view", 1.0, "{}"),
        (2, "2024-01-01 00:01:00", 1, "click", 1.0, "{}"),
        (3, "2024-01-01 00:02:00", 1, "purchase", 1.0, "{}"),
        # u2: click BEFORE first view -> counts for view only
        (4, "2024-01-01 00:00:30", 2, "click", 1.0, "{}"),
        (5, "2024-01-01 00:01:30", 2, "view", 1.0, "{}"),
        # u3: view + click, purchase before click -> no purchase credit
        (6, "2024-01-01 00:00:00", 3, "view", 1.0, "{}"),
        (7, "2024-01-01 00:02:00", 3, "purchase", 1.0, "{}"),
        (8, "2024-01-01 00:03:00", 3, "click", 1.0, "{}"),
        # u4: never views
        (9, "2024-01-01 00:00:00", 4, "purchase", 1.0, "{}"),
    ]
    d = str(tmp_path / "ev")
    spark.createDataFrame(
        [(i, t, u, et, v, pr) for i, t, u, et, v, pr in rows],
        schema="event_id BIGINT, ts STRING, user_id BIGINT, event_type STRING, "
               "value DOUBLE, props STRING",
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id",
                 "event_type", "value", "props") \
     .coalesce(1).write.mode("overwrite").parquet(d + "/events.parquet")
    from pypgoutput_spark.operators.qlib import register_views

    register_views(spark, d, ("events",))
    from pypgoutput_spark.functions.detsql import SPARK

    row = spark.sql(events_funnel_sql(SPARK)).collect()[0]
    assert row["n_view"] == 3               # u1, u2, u3
    assert row["n_click_after_view"] == 2   # u1, u3 (u2's click precedes view)
    assert row["n_purchase_after_click"] == 1  # u1 only
    assert row["total_click_to_purchase_us"] == 60_000_000


def test_kmv_union_estimates_within_band():
    """Merged-sketch (pairwise union) estimates track the exact values:
    union within the ~1/sqrt(K) band, intersection derived by
    inclusion-exclusion (three estimator errors compound — judged
    against the UNION size, its actual scale), small unions exact."""
    df = _docs_con().execute(SK.kmv_union_sql(DUCKDB)).df()
    assert len(df) == 190  # 20 choose 2 source pairs
    checked = 0
    for r in df.itertuples(index=False):
        if r.exact_union < SK.KMV_UNION_K:
            assert r.union_est == r.exact_union
            continue
        checked += 1
        rel = abs(r.union_est - r.exact_union) / r.exact_union
        assert rel < 0.9, (r.src_a, r.src_b, r.exact_union, r.union_est)
        # inclusion-exclusion inter error ∝ union scale, not inter scale
        assert abs(r.inter_est - r.exact_inter) / r.exact_union < 1.2, (
            r.src_a, r.src_b, r.exact_inter, r.inter_est, r.exact_union
        )
    assert checked > 100, "most pairs must exercise the sketch path"
    # and the estimator must beat a null model on average
    sk = df[df.exact_union >= SK.KMV_UNION_K]
    mean_rel = (abs(sk.union_est - sk.exact_union) / sk.exact_union).mean()
    assert mean_rel < 0.35, mean_rel


def test_cms_heavy_hitters_properties():
    """Count-min guarantees, checked against exact counts: estimates
    never undercount, every TRUE heavy hitter is reported (the sketch
    can only add false positives, never drop a real one), and the
    sketch itself stays within its fixed D×W footprint."""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF}/events.parquet')"
    )
    got = con.execute(SK.cms_heavy_hitters_sql(DUCKDB)).df()
    exact = con.execute(
        "SELECT user_id, count(*) AS c FROM events GROUP BY user_id"
    ).df()
    n = int(exact.c.sum())
    u = len(exact)
    true_heavy = set(exact[exact.c * u * 5 >= n * 6].user_id)
    assert true_heavy, "fixture must contain real heavy hitters"
    assert true_heavy <= set(got.user_id), "CMS must not drop a true heavy hitter"
    est = dict(zip(got.user_id, got.est_count))
    truth = dict(zip(exact.user_id, exact.c))
    for uid, e in est.items():
        assert e >= truth[uid], (uid, e, truth[uid])
    # at ~0.15 items/bucket the min-of-4 estimate is exact for nearly all
    exact_frac = sum(1 for uid, e in est.items() if e == truth[uid]) / len(est)
    assert exact_frac >= 0.9, exact_frac
    # the sketch is a fixed-size object regardless of event count
    width = con.execute(
        f"WITH {SK.cms_heavy_hitters_sql(DUCKDB).split('WITH ', 1)[1].rsplit('tot AS', 1)[0].rstrip().rstrip(',')} "
        "SELECT count(*) FROM sketch"
    ).fetchall()[0][0]
    assert width <= SK.CMS_D * SK.CMS_W
