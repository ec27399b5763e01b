"""Randomized cross-checks of asof_join / range_join against independent
pandas oracles (merge_asof, brute-force interval filter) on adversarial
inputs: duplicate timestamps, tie clusters, keys missing from either
side, and boundary-exact matches."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pypgoutput_spark.operators.asof import asof_join, range_join


def _random_frames(rng):
    nl, nr = int(rng.integers(50, 200)), int(rng.integers(20, 120))
    left = pd.DataFrame({
        "k": rng.integers(0, 8, nl),
        "t": rng.integers(0, 60, nl),          # dense -> many exact ties
        "ev": np.arange(nl, dtype=np.int64),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 10, nr),          # some keys absent on left
        "rt": rng.integers(0, 60, nr),
        "okey": rng.permutation(np.arange(nr, dtype=np.int64)),
        # nullable Int64 with ~30% NULLs: the matched right row must be
        # carried ATOMICALLY — a NULL cell must not fall through to an
        # older right row's value for that column (torn-row regression)
        "val": pd.array(rng.integers(0, 1000, nr), dtype="Int64"),
    })
    right.loc[rng.random(nr) < 0.3, "val"] = pd.NA
    return left, right


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_asof_join_matches_pandas_merge_asof(spark, seed):
    rng = np.random.default_rng(seed)
    left, right = _random_frames(rng)
    out = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        key="k", left_t="t", right_t="rt",
        carry=("okey", "val"), right_tie="okey",
    ).toPandas().sort_values("ev").reset_index(drop=True)

    # pandas oracle: right sorted by (rt, okey) so merge_asof's
    # last-duplicate pick == our highest-tie rule
    l_s = left.sort_values(["t", "ev"], kind="stable")
    r_s = right.sort_values(["rt", "okey"], kind="stable")
    exp = pd.merge_asof(
        l_s, r_s, left_on="t", right_on="rt", by="k",
        direction="backward", allow_exact_matches=True,
    ).sort_values("ev").reset_index(drop=True)

    got_ok = out["asof_okey"].astype("float64")
    exp_ok = exp["okey"].astype("float64")
    pd.testing.assert_series_equal(got_ok, exp_ok, check_names=False)
    pd.testing.assert_series_equal(
        out["asof_val"].astype("float64"), exp["val"].astype("float64"),
        check_names=False,
    )


@pytest.mark.parametrize("seed,width", [(0, 7), (1, 13), (2, 60)])
def test_range_join_matches_bruteforce(spark, seed, width):
    rng = np.random.default_rng(seed)
    left, right = _random_frames(rng)
    out = range_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        key="k", left_t="t", right_t="rt", width_us=width,
    ).toPandas()
    got = sorted(map(tuple, out[["ev", "okey"]].itertuples(index=False)))

    cross = left.merge(right, on="k")
    mask = (cross["t"] >= cross["rt"]) & (cross["t"] < cross["rt"] + width)
    exp = sorted(map(tuple, cross.loc[mask, ["ev", "okey"]].itertuples(index=False)))
    assert got == exp


def test_asof_join_null_carry_not_torn(spark):
    """Deterministic torn-row regression: the matched right row has a NULL
    carry column; per-column last(ignorenulls) would splice the OLDER
    right row's value into that column. The match must be atomic."""
    left = spark.createDataFrame([(1, 250, 10)], "k INT, t INT, ev INT")
    right = spark.createDataFrame(
        [(1, 100, 1, 5.0), (1, 200, 2, None)],
        "k INT, rt INT, okey INT, val DOUBLE",
    )
    out = asof_join(
        left, right, key="k", left_t="t", right_t="rt",
        carry=("okey", "val"), right_tie="okey",
    ).collect()
    assert len(out) == 1
    row = out[0]
    assert row["asof_okey"] == 2
    assert row["asof_val"] is None, "NULL carry must not fall back to okey=1's 5.0"
