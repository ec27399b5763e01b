"""Semantics of the session-7 pipeline operators: corpus_chunk (RAG
chunking with overlap), corpus_split (stratified deterministic split),
events_anomaly (per-user z-score outliers).

Cross-engine parity for chunk/split rides the randomized corpus sweep in
test_text_ops_randomized.py; these tests pin the SEMANTICS — span
coverage/overlap invariants, the chunk-count formula, partition-
invariance of the split assignment, and the anomaly math against a
hand-computed fixture — which a hash compare alone would not localize.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from pypgoutput_spark.functions.detsql import DUCKDB, SPARK
from pypgoutput_spark.operators import analytics as an
from pypgoutput_spark.operators import text as text_ops
from pypgoutput_spark.operators.qlib import run_sql


def _write_docs(spark, tmp_path, rows):
    d = str(tmp_path)
    spark.createDataFrame(
        rows,
        schema="doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    ).coalesce(1).write.mode("overwrite").parquet(d + "/documents.parquet")
    return d


def test_chunk_spans_cover_and_overlap(spark, tmp_path):
    # doc lengths straddling every edge: < size, == size, size+1,
    # one full stride past, and a long multi-chunk doc
    size, stride = text_ops.CHUNK_SIZE, text_ops.CHUNK_STRIDE
    lens = [1, size - 1, size, size + 1, size + stride, 5 * size]
    rows = [
        (i, " ".join(f"w{i}t{j}" for j in range(n)), "en", "s", 1)
        for i, n in enumerate(lens)
    ]
    d = _write_docs(spark, tmp_path, rows)
    pdf = (
        run_sql(spark, d, text_ops.chunk_sql(SPARK), tables=("documents",))
        .toPandas()
        .sort_values(["doc_id", "chunk_idx"])
    )
    for doc_id, n in enumerate(lens):
        ch = pdf[pdf.doc_id == doc_id]
        want = 1 if n <= size else 1 + math.ceil((n - size) / stride)
        assert len(ch) == want, (doc_id, n)
        assert ch.chunk_idx.tolist() == list(range(want))
        assert ch.tok_start.iloc[0] == 1
        assert ch.tok_end.iloc[-1] == n          # last chunk reaches the end
        assert (ch.tok_end - ch.tok_start + 1 == ch.n_chunk_toks).all()
        assert (ch.n_chunk_toks <= size).all()
        # consecutive starts advance by exactly one stride → fixed overlap
        starts = ch.tok_start.tolist()
        assert all(b - a == stride for a, b in zip(starts, starts[1:]))
        # every token index 1..n is inside at least one span
        covered = set()
        for s, e in zip(ch.tok_start, ch.tok_end):
            covered.update(range(int(s), int(e) + 1))
        assert covered == set(range(1, n + 1))
        # chunk text really is the span's tokens
        row = ch.iloc[-1]
        assert row.chunk_text.split(" ")[0] == f"w{doc_id}t{int(row.tok_start) - 1}"
        assert row.chunk_text.split(" ")[-1] == f"w{doc_id}t{n - 1}"
    # fingerprints are unique across all chunks here (distinct content)
    assert pdf.chunk_fp.is_unique


def test_chunk_plan_has_no_exchange(spark, tmp_path):
    rows = [(i, "a b c", "en", "s", 1) for i in range(4)]
    d = _write_docs(spark, tmp_path, rows)
    df = run_sql(spark, d, text_ops.chunk_sql(SPARK), tables=("documents",))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure per-row explode — shuffle-free


def test_corpus_split_partition_invariant_and_proportional(spark, tmp_path):
    rows = [
        (i, " ".join(f"t{j}" for j in range(1 + i % 7)), "en", f"src{i % 3}", 1)
        for i in range(3000)
    ]
    d = _write_docs(spark, tmp_path, rows)
    base = (
        run_sql(spark, d, text_ops.corpus_split_sql(SPARK), tables=("documents",))
        .toPandas()
        .sort_values(["source", "split"])
        .reset_index(drop=True)
    )
    # re-run over a repartitioned view: assignment is content-hash-seeded,
    # so layout must not change a single count
    spark.read.parquet(d + "/documents.parquet").repartition(16).createOrReplaceTempView(
        "documents"
    )
    again = (
        spark.sql(text_ops.corpus_split_sql(SPARK))
        .toPandas()
        .sort_values(["source", "split"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(base, again)
    tot = base.groupby("split").n_docs.sum()
    assert set(tot.index) == {"train", "val", "test"}
    assert 0.75 <= tot["train"] / 3000 <= 0.85
    assert tot["val"] / 3000 <= 0.15 and tot["test"] / 3000 <= 0.15
    # every (source, split) cell present → stratification is real
    assert len(base) == 9
    # the manifest MUST agree with the split corpus_sample assigns —
    # one rule, one salt, no train/eval leakage between operators
    sample = spark.sql(text_ops.corpus_sample_sql(SPARK)).toPandas()
    cross = (
        sample.groupby(["source", "split"]).size().rename("n_docs").reset_index()
        .sort_values(["source", "split"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        base[["source", "split", "n_docs"]].astype({"n_docs": "int64"}),
        cross.astype({"n_docs": "int64"}),
    )


def test_events_anomaly_math_and_parity(spark, tmp_path):
    # user 1: 9 values of 10.0 plus one 100.0 → mean 19, var 729, std 27,
    # z(100) = 3 → flagged; z(10) = -1/3 → not. user 2: constant (std 0,
    # must not divide). user 3: below min_events.
    rows = (
        [(i, "2024-01-01 00:00:%02d" % i, 1, "m", 10.0, "{}") for i in range(9)]
        + [(9, "2024-01-01 00:01:00", 1, "m", 100.0, "{}")]
        + [(10 + i, "2024-01-01 00:00:%02d" % i, 2, "m", 5.0, "{}") for i in range(6)]
        + [(20, "2024-01-01 00:00:00", 3, "m", 999.0, "{}")]
        # user 4: constant 1.2e-5 — its square underflows the decimal
        # quantization so the raw variance rounds NEGATIVE; without the
        # greatest(var, 0) clamp DuckDB's sqrt() throws (Spark gives
        # NaN, and NaN > 0 is TRUE in both engines, so the clamp is
        # also what makes the std_v > 0 filter actually exclude it)
        + [(30 + i, "2024-01-01 00:00:%02d" % i, 4, "m", 1.2e-5, "{}")
           for i in range(7)]
    )
    d = str(tmp_path)
    spark.createDataFrame(
        rows,
        schema="event_id BIGINT, ts STRING, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type",
        "value", "props",
    ).coalesce(1).write.mode("overwrite").parquet(d + "/events.parquet")

    pdf = run_sql(spark, d, an.events_anomaly_sql(SPARK), tables=("events",)).toPandas()
    assert pdf.event_id.tolist() == [9]
    r = pdf.iloc[0]
    assert r.user_id == 1 and r.value == 100.0
    assert abs(r.mean_v - 19.0) < 1e-12
    assert abs(r.std_v - 27.0) < 1e-12
    assert abs(r.zscore - 3.0) < 1e-12

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{d}/events.parquet/*.parquet')"
    )
    odf = con.execute(an.events_anomaly_sql(DUCKDB)).df()
    assert odf.event_id.tolist() == [9]
    assert float(odf.iloc[0].zscore) == float(r.zscore)  # bit-identical tree
