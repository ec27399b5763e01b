"""Recall floor for the two-stage LSH ANN (VERDICT r2 #6).

sim_lsh_topk's defaults (4 bits x 8 bands, multiprobe 2) must keep
recall@10 above a floor on the fixed sf0.001 corpus; the r2 defaults
measured 0.45 at sf0.01 (see BENCH/BASELINE.md for the sweep)."""

from __future__ import annotations

from pypgoutput_spark.operators.similarity import ann_recall_at_k


def test_lsh_topk_default_recall_floor(spark):
    r = ann_recall_at_k(
        spark, "/root/testdata/sf0.001", k=10,
        bits_per_band=4, n_bands=8, multiprobe=2, n_queries=10,
    )
    assert r["recall_at_k"] >= 0.85, r
    # and the index is doing its job: candidates a small corpus fraction
    # (tiny corpora collide more; at sf0.01 the fraction is ~0.07)
    assert r["mean_candidates"] > 0
