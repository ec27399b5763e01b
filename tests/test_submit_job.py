"""jobs/cdc_ingest.py — the spark-submit entry point.

The north rule runs the engine "via spark-submit --py-files"; this test
does exactly that: the library is zipped, the job is submitted from a
NEUTRAL working directory (so ``pypgoutput_spark`` resolves only through
``--py-files``), tables bootstrap from the stream's own Relation frames,
and the merged state is compared to the DuckDB serial oracle. A second
identical submission must be a watermark no-op (resubmit safety).
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import zipfile

import duckdb
import pandas as pd
import pytest

from pypgoutput_spark.lake.table import LakeTable
from pypgoutput_spark.wal import generator as gen

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
P = gen.GenParams(
    n_txns=40, ops_per_txn=6, n_repos=12, n_paths=8,
    toast_pct=30, txns_per_segment=10,
)


def _zip_package(dest: str) -> str:
    zp = os.path.join(dest, "pypgoutput_spark.zip")
    with zipfile.ZipFile(zp, "w") as z:
        for f in glob.glob(os.path.join(REPO, "pypgoutput_spark/**/*.py"),
                           recursive=True):
            z.write(f, os.path.relpath(f, REPO))
    return zp


def _submit(tmp, zp, extra, lake="lake"):
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only import path
    r = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zp,
         os.path.join(REPO, "jobs", "cdc_ingest.py"),
         "--frames-dir", f"{tmp}/frames", "--lake-root", f"{tmp}/{lake}",
         *extra],
        cwd=tmp, env=env, capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-4000:]
    reports = [l for l in r.stdout.splitlines() if l.startswith("{")]
    assert reports, r.stdout[-2000:]
    return json.loads(reports[-1])


@pytest.fixture(scope="module")
def submit_env(spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("submit"))
    gen.spark_frames_df(spark, P).write.parquet(f"{tmp}/frames")
    return tmp, _zip_package(tmp)


def _assert_matches_oracle(spark, table_path):
    table = LakeTable(spark, table_path)
    got = (table.read().toPandas()
           .sort_values(["repo", "path"]).reset_index(drop=True))
    want = (duckdb.sql(gen.duckdb_final_state_sql(P, with_sha=False)).df()
            .sort_values(["repo", "path"]).reset_index(drop=True))
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)


def test_spark_submit_batch_bootstrap_and_resubmit(spark, submit_env):
    tmp, zp = submit_env

    rep = _submit(tmp, zp, ["--mode", "batch", "--n-batches", "2",
                            "--n-buckets", "8"])
    (rid, tinfo), = rep["tables"].items()
    assert tinfo["path"].endswith("public.repo_files")
    assert tinfo["watermark_lsn"] > 0
    v1 = tinfo["version"]

    # merged state ≡ the serial DuckDB oracle (content included)
    _assert_matches_oracle(spark, tinfo["path"])

    # resubmitting the identical job is a watermark no-op
    rep2 = _submit(tmp, zp, ["--mode", "batch", "--n-batches", "2",
                             "--n-buckets", "8"])
    assert rep2["tables"][rid]["version"] == v1
    assert rep2["tables"][rid]["watermark_lsn"] == tinfo["watermark_lsn"]


def test_spark_submit_stream_mode(spark, submit_env):
    tmp, zp = submit_env
    rep = _submit(tmp, zp, ["--mode", "stream", "--n-buckets", "8"],
                  lake="lake_stream")
    (_, tinfo), = rep["tables"].items()
    assert tinfo["watermark_lsn"] > 0
    _assert_matches_oracle(spark, tinfo["path"])


def test_spark_submit_with_stream_spill(spark, submit_env):
    """--stream-spill-mb 0 forces every streamed transaction through the
    disk-spill decode inside a real spark-submit run; the merged state
    must still equal the serial oracle."""
    tmp, zp = submit_env
    p = gen.GenParams(
        n_txns=40, ops_per_txn=6, n_repos=12, n_paths=8, toast_pct=30,
        txns_per_segment=10, stream_pct=60, stream_abort_pct=20,
        interleave_streams=True,
    )
    gen.spark_frames_df(spark, p).write.parquet(f"{tmp}/frames_streamed")
    # a repeated --frames-dir takes the last occurrence under argparse
    rep = _submit(
        tmp, zp,
        ["--frames-dir", f"{tmp}/frames_streamed", "--mode", "batch",
         "--n-batches", "2", "--n-buckets", "8", "--stream-spill-mb", "0"],
        lake="lake_spill",
    )
    (_, tinfo), = rep["tables"].items()
    assert tinfo["watermark_lsn"] > 0
    table = LakeTable(spark, tinfo["path"])
    got = (table.read().toPandas()
           .sort_values(["repo", "path"]).reset_index(drop=True))
    want = (duckdb.sql(gen.duckdb_final_state_sql(p, with_sha=False)).df()
            .sort_values(["repo", "path"]).reset_index(drop=True))
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)
