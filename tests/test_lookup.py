"""Point-lookup read path: LakeTable.lookup scans only the hash buckets
the probed keys map to (manifest bucket pruning) and resolves dirty
buckets with the normal merge-on-read LWW rule.

The 100 TB contract pinned here: files scanned ∝ probed-bucket count,
not table size — the property that makes a CDC mirror double as a
serving table.
"""

from __future__ import annotations

from pypgoutput_spark.lake.table import LakeTable
from pypgoutput_spark.operators.merge import merge_into


def _mk_loaded(spark, tmp_path, n_buckets=8, n_keys=64):
    t = LakeTable.create(
        spark, str(tmp_path / "lake"),
        schema=[("k", "string"), ("a", "string"), ("b", "string")],
        key_cols=["k"], n_buckets=n_buckets,
    )
    rows = [(f"k{i}", "I", 100 + i, {"v": f"a{i}"}, {"v": f"b{i}"})
            for i in range(n_keys)]
    merge_into(t, spark.createDataFrame(
        rows,
        schema="k STRING, final_op STRING, max_lsn BIGINT, "
               "r_a STRUCT<v: STRING>, r_b STRUCT<v: STRING>",
    ), watermark_lsn=100 + n_keys)
    return t


def test_lookup_matches_filtered_read_and_prunes(spark, tmp_path):
    t = _mk_loaded(spark, tmp_path)
    # dirty one bucket: update k3, delete k5 (MOR delta commit)
    merge_into(t, spark.createDataFrame(
        [("k3", "U", 500, {"v": "a3new"}, None),
         ("k5", "D", 501, None, None)],
        schema="k STRING, final_op STRING, max_lsn BIGINT, "
               "r_a STRUCT<v: STRING>, r_b STRUCT<v: STRING>",
    ), watermark_lsn=501, auto_compact=False)

    probe = ["k3", "k5", "k7"]
    got = {r["k"]: (r["a"], r["b"]) for r in t.lookup(probe).collect()}
    want = {
        r["k"]: (r["a"], r["b"])
        for r in t.read().where("k IN ('k3','k5','k7')").collect()
    }
    assert got == want
    assert got["k3"] == ("a3new", "b3")  # delta resolved, TOAST fallback on b
    assert "k5" not in got               # deleted
    assert got["k7"] == ("a7", "b7")     # clean-bucket row

    # pruning: the lookup plan reads at most |probe| buckets' files,
    # strictly fewer than the full read (64 keys across 8 buckets)
    full_files = set(t.read().inputFiles())
    probe_files = set(t.lookup(probe).inputFiles())
    assert probe_files and probe_files < full_files
    snap = t.snapshot()
    dirs = {f.rsplit("/", 1)[0].replace("file:", "") for f in probe_files}
    hit_buckets = {
        b for b, dd in list(snap["buckets"].items()) + list(snap["deltas"].items())
        if any(d in dirs for d in dd)
    }
    assert len(hit_buckets) <= len(probe)


def test_lookup_dataframe_probe_and_scalar_forms(spark, tmp_path):
    t = _mk_loaded(spark, tmp_path, n_keys=16)
    kdf = spark.createDataFrame([("k1",), ("k9",), ("k1",)], schema="k STRING")
    got_df = sorted(r["k"] for r in t.lookup(kdf).collect())
    got_sc = sorted(r["k"] for r in t.lookup(["k1", "k9"]).collect())
    got_tu = sorted(r["k"] for r in t.lookup([("k1",), ("k9",)]).collect())
    assert got_df == got_sc == got_tu == ["k1", "k9"]


def test_lookup_missing_key_returns_empty(spark, tmp_path):
    t = _mk_loaded(spark, tmp_path, n_keys=8)
    assert t.lookup(["nope"]).count() == 0
