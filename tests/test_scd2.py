"""SCD Type-2 history from the change feed (operators/scd.py).

Hand-built feed frames pin the exact version algebra (carry-forward,
delete close, re-insert, truncate-marker close); the plan test pins the
single-exchange shape; the e2e test replays a generated CDC stream and
checks the history against the DuckDB oracle rendering.
"""

from __future__ import annotations

import duckdb
import pytest

from pypgoutput_spark.operators.scd import scd2_history, scd2_oracle_sql

FEED_COLS = "k string, final_op string, max_lsn long, v string, upd_v boolean, _commit_version long"


def _hist(spark, rows, **kw):
    feed = spark.createDataFrame(rows, FEED_COLS)
    out = scd2_history(feed, ["k"], ["v"], **kw)
    return {
        (r["k"], r["valid_from_version"]): (
            r["v"], r["valid_to_version"], r["valid_to_lsn"], r["is_current"]
        )
        for r in out.collect()
    }


def test_carry_delete_reinsert(spark):
    rows = [
        ("a", "U", 10, "x", True, 1),
        ("a", "U", 20, None, False, 2),   # TOAST-unchanged: inherits 'x'
        ("a", "D", 30, None, True, 3),    # closes v2, emits no version
        ("a", "I", 40, "z", True, 4),     # re-insert: carried NULL reset, new value
        ("b", "U", 10, "q", True, 1),
    ]
    h = _hist(spark, rows)
    assert h == {
        ("a", 1): ("x", 2, 20, False),
        ("a", 2): ("x", 3, 30, False),
        ("a", 4): ("z", None, None, True),
        ("b", 1): ("q", None, None, True),
    }


def test_truncate_marker_closes_open_versions(spark):
    rows = [
        ("a", "U", 10, "x", True, 1),
        (None, "T", -1, None, False, 3),  # truncate marker (NULL key)
        ("a", "I", 40, "z", True, 4),     # re-insert after truncate
        ("b", "U", 20, "q", True, 2),     # never re-inserted: dies at the truncate
    ]
    h = _hist(spark, rows)
    # 'a' v1 closes at the truncate (version grain only — markers carry
    # no row LSN); the post-truncate re-insert is current.
    assert h == {
        ("a", 1): ("x", 3, None, False),
        ("a", 4): ("z", None, None, True),
        ("b", 2): ("q", 3, None, False),
    }
    # explicit truncate_versions skips marker discovery, same result
    assert _hist(spark, rows, truncate_versions=(3,)) == h


def test_next_row_close_beats_later_truncate(spark):
    rows = [
        ("a", "U", 10, "x", True, 1),
        ("a", "U", 20, "y", True, 2),     # closes v1 BEFORE the truncate
        (None, "T", -1, None, False, 3),
    ]
    h = _hist(spark, rows)
    assert h == {
        ("a", 1): ("x", 2, 20, False),
        ("a", 2): ("y", 3, None, False),
    }


def test_single_exchange_plan(spark):
    feed = spark.createDataFrame(
        [("a", "U", 10, "x", True, 1)], FEED_COLS
    )
    plan = scd2_history(
        feed, ["k"], ["v"], truncate_versions=()
    )._jdf.queryExecution().executedPlan().toString()
    # one key-hash exchange feeds both window passes; no joins anywhere
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan


def test_e2e_matches_duckdb_oracle(spark):
    import __spark_entry__ as entry
    from pypgoutput_spark.wal import generator as gen
    from pypgoutput_spark.streaming import pipeline as pl

    p = gen.GenParams(
        n_txns=40, ops_per_txn=6, n_repos=12, n_paths=8,
        toast_pct=30, txns_per_segment=10,
    )
    table = entry._ingest_cdc(spark, p, n_batches=2)
    got = scd2_history(
        table.changes(0), ["repo", "path"], ["commit", "lang", "content"]
    )
    sql = scd2_oracle_sql(
        entry._cdc_change_feed_oracle(p, 2),
        ["repo", "path"], ["commit", "lang", "content"],
    )
    want = duckdb.connect().execute(sql).fetchdf()

    def norm(pdf):
        cols = sorted(pdf.columns)
        rows = []
        for r in pdf[cols].itertuples(index=False):
            cells = []
            for x in r:
                if x is None or (isinstance(x, float) and x != x):
                    cells.append(None)
                elif isinstance(x, float):
                    cells.append(int(x))
                elif isinstance(x, bool) or type(x).__name__ == "bool_":
                    cells.append(bool(x))
                elif isinstance(x, str):
                    cells.append(x)
                else:
                    cells.append(int(x))
            rows.append(tuple(cells))
        return sorted(rows)

    g, w = norm(got.toPandas()), norm(want)
    assert len(g) == len(w) > 0
    assert g == w
