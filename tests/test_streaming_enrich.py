"""Stream enrichment against the CDC-maintained dimension: each
micro-batch joins the dimension state committed BEFORE that batch —
the per-batch snapshot re-resolution that a plain (plan-frozen)
stream-static join cannot give."""

from __future__ import annotations

import time

from pypgoutput_spark.lake.table import LakeTable
from pypgoutput_spark.operators.merge import merge_into
from pypgoutput_spark.streaming.enrich import enrich_stream

EV_SCHEMA = "event_id BIGINT, k STRING"
CH_SCHEMA = (
    "k STRING, final_op STRING, max_lsn BIGINT, r_name STRUCT<v: STRING>"
)


def _dim(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "dim"),
        schema=[("k", "string"), ("name", "string")],
        key_cols=["k"], n_buckets=4,
    )
    merge_into(t, spark.createDataFrame(
        [(f"k{i}", "I", 10 + i, {"v": f"v1_{i}"}) for i in range(8)],
        schema=CH_SCHEMA), watermark_lsn=100)
    return t


def _run(spark, tmp_path, table, lookup_keys):
    src = str(tmp_path / f"src_{lookup_keys}")
    out = str(tmp_path / f"out_{lookup_keys}")
    # batch 0: events for k0..k3; batch 1: k0 again + an unknown key
    spark.createDataFrame([(i, f"k{i}") for i in range(4)],
                          schema=EV_SCHEMA).coalesce(1).write.parquet(src)
    time.sleep(1.1)
    spark.createDataFrame([(10, "k0"), (11, "k_missing")],
                          schema=EV_SCHEMA).coalesce(1).write.mode(
        "append").parquet(src)

    def on_batch(batch_id):
        # between batches the CDC pipeline keeps committing: k0 is
        # revised after the FIRST batch lands
        if batch_id == 0:
            merge_into(table, table.spark.createDataFrame(
                [("k0", "U", 500, {"v": "v2_0"})], schema=CH_SCHEMA),
                watermark_lsn=500, auto_compact=False)

    stream = (
        table.spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = enrich_stream(stream, table, on="k", out_dir=out,
                      lookup_keys=lookup_keys, on_batch=on_batch)
    q.awaitTermination(120)
    return {
        r["event_id"]: (r["name"], r["_batch_id"])
        for r in table.spark.read.parquet(out).collect()
    }


def test_enrichment_sink_is_replay_idempotent(spark, tmp_path):
    """A crash between the parquet write and the checkpoint commit
    replays the batch; the dynamic partition-overwrite sink must replace
    the earlier attempt's rows, never duplicate them. Simulated by
    discarding the checkpoint and re-running the whole stream (every
    batch replays with its original batch id)."""
    import shutil

    table = _dim(spark, tmp_path)
    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    spark.createDataFrame([(i, f"k{i}") for i in range(4)],
                          schema=EV_SCHEMA).coalesce(1).write.parquet(src)
    for _ in range(2):  # second run replays batch 0 from scratch
        stream = spark.readStream.schema(EV_SCHEMA).parquet(src)
        q = enrich_stream(stream, table, on="k", out_dir=out)
        q.awaitTermination(120)
        shutil.rmtree(out + "_ckpt")
    rows = spark.read.parquet(out).collect()
    assert sorted(r["event_id"] for r in rows) == [0, 1, 2, 3], (
        "replayed batch must overwrite its partition, not append duplicates"
    )


def test_enrichment_sees_interbatch_dimension_commits(spark, tmp_path):
    for lookup_keys in (True, False):
        table = _dim(spark, tmp_path / str(lookup_keys))
        got = _run(spark, tmp_path / str(lookup_keys), table, lookup_keys)
        # batch 0 joined the v1 dimension
        assert got[0] == ("v1_0", 0) and got[3] == ("v1_3", 0)
        # batch 1 sees the revision committed after batch 0
        assert got[10] == ("v2_0", 1)
        # unknown key passes through NULL-extended (left join)
        assert got[11] == (None, 1)
