"""Recall floor for the IVF-Flat ANN path (`sim_ivf_topk`).

Deterministic seeding + one integer-exact Lloyd refinement; defaults
(16 centroids, 4 probes = 25% expected scan fraction) must beat the
random-scan baseline (recall ≈ fraction = 0.25) by a wide margin on the
fixed corpus. Measured 0.50-0.53 at defaults (2.1x random-scan; the
synthetic embeddings are near-uniform — no cluster structure for the
coarse quantizer to exploit; see BENCH/BASELINE.md). Runs through
DuckDB — representative because the CORRECTNESS gate hash-verifies both
dialects of the same SQL builders."""

from __future__ import annotations

from pypgoutput_spark.operators.similarity import (
    ivf_recall_at_k,
    write_clustered_embeddings,
)


def test_ivf_clustered_corpus_recall(tmp_path):
    """Where IVF actually wins (round-3 verdict task): on a clustered
    corpus (deterministic Gaussian mixture) the coarse quantizer captures
    the structure — recall@10 ≥ 0.9 while scanning ≤ 30% of the corpus."""
    d = write_clustered_embeddings(str(tmp_path / "clustered"))
    r = ivf_recall_at_k(d, k=10, n_probes=3, n_queries=10)
    assert r["recall_at_k"] >= 0.9, r
    assert r["mean_candidates"] <= 0.3 * r["corpus"], r


def test_ivf_lloyd_iterations_lift_recall(tmp_path):
    """On an overlapping mixture, each distributed Lloyd refinement
    (explode → map-side-combining sums → rebuild) lifts recall at a
    FIXED probe budget — the reason n_iters is a parameter."""
    d = write_clustered_embeddings(str(tmp_path / "hard"), spread=0.25, seed=11)
    lo = ivf_recall_at_k(d, k=10, n_probes=2, n_queries=10, n_iters=0)
    hi = ivf_recall_at_k(d, k=10, n_probes=2, n_queries=10, n_iters=3)
    assert hi["recall_at_k"] > lo["recall_at_k"] + 0.1, (lo, hi)
    assert hi["mean_candidates"] <= 1.2 * lo["mean_candidates"], (lo, hi)


def test_ivf_topk_default_recall_floor():
    r = ivf_recall_at_k("/root/testdata/sf0.001", k=10, n_probes=4, n_queries=20)
    assert r["recall_at_k"] >= 0.45, r
    # the index prunes: candidates ≈ probes/centroids of the corpus
    assert r["mean_candidates"] < 0.35 * r["corpus"], r


def test_ivf_more_probes_more_recall():
    lo = ivf_recall_at_k("/root/testdata/sf0.001", k=10, n_probes=2, n_queries=10)
    hi = ivf_recall_at_k("/root/testdata/sf0.001", k=10, n_probes=6, n_queries=10)
    assert hi["recall_at_k"] > lo["recall_at_k"], (lo, hi)
    assert hi["mean_candidates"] > lo["mean_candidates"], (lo, hi)
