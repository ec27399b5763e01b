"""As-of and range joins: handcrafted boundary semantics, plan shape
(no inequality-join physical nodes), and Spark ≡ DuckDB parity on the
synthetic tables."""

from __future__ import annotations

import duckdb
import pytest

from pypgoutput_spark.operators.asof import (
    QUERIES,
    asof_join,
    range_join,
)


def _asof_fixture(spark):
    left = spark.createDataFrame(
        [
            (1, 50, 100),   # before any right row -> NULLs
            (1, 100, 101),  # exactly at r_t=100 -> <= includes it
            (1, 250, 102),  # between 200-tie rows and 300
            (1, 300, 103),
            (2, 999, 200),  # key with no right rows at all
        ],
        "k BIGINT, t BIGINT, ev BIGINT",
    )
    right = spark.createDataFrame(
        [
            (1, 100, 10, 1.0),
            (1, 200, 11, 2.0),  # same-t tie: higher tie (12) must win
            (1, 200, 12, 3.0),
            (1, 300, 13, 4.0),
        ],
        "k BIGINT, rt BIGINT, okey BIGINT, val DOUBLE",
    )
    return left, right


def test_asof_join_semantics(spark):
    left, right = _asof_fixture(spark)
    out = asof_join(left, right, key="k", left_t="t", right_t="rt",
                    carry=("okey", "val"), right_tie="okey")
    got = {r["ev"]: (r["asof_okey"], r["asof_val"]) for r in out.collect()}
    assert got[100] == (None, None)
    assert got[101] == (10, 1.0)   # boundary: rt == t is visible
    assert got[102] == (12, 3.0)   # tie at rt=200 -> max tie, paired val
    assert got[103] == (13, 4.0)
    assert got[200] == (None, None)
    # every left row survives, left columns intact
    assert sorted(out.columns) == ["asof_okey", "asof_val", "ev", "k", "t"]
    assert out.count() == 5


def test_asof_join_plan_is_single_exchange_window(spark):
    left, right = _asof_fixture(spark)
    out = asof_join(left, right, key="k", left_t="t", right_t="rt",
                    carry=("okey", "val"), right_tie="okey")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "Cartesian" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window") == 1  # both carries share one Window node


def test_range_join_semantics(spark):
    # width 100: right row at rt=95 spans [95, 195) -> crosses into bin 1
    left = spark.createDataFrame(
        [(1, 94, 0), (1, 95, 1), (1, 150, 2), (1, 194, 3), (1, 195, 4),
         (2, 150, 5)],
        "k BIGINT, t BIGINT, ev BIGINT",
    )
    right = spark.createDataFrame([(1, 95, 7)], "k BIGINT, rt BIGINT, okey BIGINT")
    out = range_join(left, right, key="k", left_t="t", right_t="rt",
                     width_us=100)
    got = sorted(r["ev"] for r in out.collect())
    assert got == [1, 2, 3]  # [rt, rt+width): 95 in, 194 in, 94/195/other-key out
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "Cartesian" not in plan


def test_range_join_negative_t_floor_bins(spark):
    # floor (not truncate-toward-zero) binning: rt=-50 spans [-50, 50)
    left = spark.createDataFrame(
        [(1, -51, 0), (1, -50, 1), (1, -1, 2), (1, 0, 3), (1, 49, 4), (1, 50, 5)],
        "k BIGINT, t BIGINT, ev BIGINT",
    )
    right = spark.createDataFrame([(1, -50, 7)], "k BIGINT, rt BIGINT, okey BIGINT")
    out = range_join(left, right, key="k", left_t="t", right_t="rt",
                     width_us=100)
    assert sorted(r["ev"] for r in out.collect()) == [1, 2, 3, 4]


def test_range_join_column_collision_raises(spark):
    df = spark.createDataFrame([(1, 2)], "k BIGINT, t BIGINT")
    with pytest.raises(ValueError, match="collision"):
        range_join(df, df, key="k", left_t="t", right_t="t", width_us=10)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_spark_matches_duckdb_at_sf(spark, name):
    sf = "/root/testdata/sf0.001"
    fn, oracle = QUERIES[name]
    sdf = fn(spark, sf).toPandas()
    con = duckdb.connect()
    for t in ("events", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    odf = con.execute(oracle).df()
    assert len(sdf) == len(odf) and len(sdf) > 0
    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns)

    def canon(df):
        rows = []
        for tup in df[cols].itertuples(index=False):
            rows.append(tuple(
                "\\N" if v is None or (isinstance(v, float) and v != v)
                else (f"{v:.10g}" if isinstance(v, float) else str(v))
                for v in tup
            ))
        return sorted(rows)

    assert canon(sdf) == canon(odf)
