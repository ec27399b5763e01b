"""Similarity search over embedding columns (array<float>).

Two paths, as a production ANN stack would stage them:

  - **brute-force cosine top-k** (`sim_topk_bruteforce`): exact baseline.
    In Spark the ORDER BY ... LIMIT k compiles to TakeOrderedAndProject —
    a per-partition top-k + tiny driver merge, never a global sort, so it
    scales linearly with the scan.
  - **random-hyperplane LSH** (`sim_lsh_buckets`, `sim_lsh_ann_pairs`):
    the scale path. Hyperplanes are ±1 vectors derived from md5 bits and
    embedded as *literal* arrays (computed once in Python via hashlib —
    identical constants in the Spark plan and the DuckDB oracle, zero
    per-row hash calls). Candidate generation is a self-join on the
    16-bit bucket key — high-cardinality, uniform, skew-free.

Float discipline (hash-stable oracles): embeddings are quantized to
integer milli-units; dot products and norms are exact BIGINTs; the only
floating-point ops are single IEEE multiplies/divides/sqrt on identical
inputs, which are bit-deterministic across engines.
"""

from __future__ import annotations

import hashlib

from pypgoutput_spark.functions.detsql import DUCKDB, SPARK, Dialect
from pypgoutput_spark.operators.qlib import run_sql

DIM = 64
#: default hyperplane count for the fixed CORRECTNESS entries; real
#: deployments size it from corpus cardinality via :func:`n_planes_for`
N_PLANES = 16


def n_planes_for(n_vectors: int) -> int:
    """Bucket-width parameterization for corpus scale.

    With ``bits`` random hyperplanes there are ``2**bits`` buckets and the
    expected *within-bucket candidate pairs* for a near-uniform corpus is
    ``C(n / 2**bits, 2) * 2**bits ≈ n² / 2**(bits+1)`` — so holding
    ``bits ≈ log2(n) + c`` bounds candidates at ``n / 2**(c+1)`` per
    bucket-pair unit regardless of corpus growth. c=4 keeps expected
    occupancy ≈ 1/16 vectors per bucket; clamp to [8, 32] (beyond 32 the
    int bucket key would overflow and recall for mid-similarity pairs
    collapses — use banded multi-probe instead, see
    operators.dedup.embedding_ann_sql).
    """
    import math

    return int(min(32, max(8, math.ceil(math.log2(max(n_vectors, 2))) + 4)))


def _hyperplane(j: int) -> list:
    """Deterministic ±1 hyperplane j (md5-bit derived, engine-independent)."""
    comps = []
    for d in range(DIM):
        h = hashlib.md5(f"hp{j}:{d}".encode()).hexdigest()
        comps.append(1 if int(h[:8], 16) % 2 == 0 else -1)
    return comps


def _quant(d: Dialect) -> str:
    return d.array_transform(
        "embedding", "x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)"
    )


def _arr_lit(d: Dialect, vals) -> str:
    body = ", ".join(str(v) for v in vals)
    return f"array({body})" if d.name == "spark" else f"[{body}]"


def topk_bruteforce_sql(d: Dialect, k: int = 10) -> str:
    dot = d.dot_bigint("a.qv", "q.qv", DIM)
    na = d.dot_bigint("a.qv", "a.qv", DIM)
    nq = d.dot_bigint("q.qv", "q.qv", DIM)
    return f"""
WITH e AS (SELECT vec_id, {_quant(d)} AS qv FROM embeddings),
q AS (SELECT qv FROM e WHERE vec_id = (SELECT min(vec_id) FROM e)),
scored AS (
  SELECT a.vec_id,
    CAST({dot} AS DOUBLE) / sqrt(CAST({na} AS DOUBLE) * CAST({nq} AS DOUBLE)) AS score
  FROM e a, q
  WHERE a.vec_id <> (SELECT min(vec_id) FROM e)
)
SELECT vec_id, score FROM scored
ORDER BY score DESC, vec_id
LIMIT {k}
""".strip()


def lsh_buckets_sql(d: Dialect, n_planes: int = N_PLANES) -> str:
    bits = []
    for j in range(n_planes):
        dot = d.dot_bigint("qv", _arr_lit(d, _hyperplane(j)), DIM)
        bits.append(f"(CASE WHEN {dot} > 0 THEN {1 << j} ELSE 0 END)")
    bucket = " + ".join(bits)
    return f"""
WITH e AS (SELECT vec_id, label, {_quant(d)} AS qv FROM embeddings)
SELECT vec_id, label, CAST({bucket} AS BIGINT) AS bucket
FROM e
""".strip()


def lsh_ann_pairs_sql(d: Dialect, n_planes: int = N_PLANES) -> str:
    return f"""
WITH b AS ({lsh_buckets_sql(d, n_planes)})
SELECT a.vec_id AS vec_a, c.vec_id AS vec_b, a.bucket
FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
""".strip()


def lsh_topk_sql(d: Dialect, k: int = 10, bits_per_band: int = 4,
                 n_bands: int = 4) -> str:
    """IVF/LSH-cell top-k: the query probes only vectors sharing at least
    one LSH band cell (candidates ~ corpus × per-band collision rate,
    never a full scan), then exact cosine ranks the candidates — the
    two-stage ANN serving shape. Bands reuse the first
    ``bits_per_band × n_bands`` hyperplanes; the exact variant
    (`sim_topk_bruteforce`) is the recall baseline."""
    na = d.dot_bigint("qv", "qv", DIM)
    band_structs = []
    for b in range(n_bands):
        bits = []
        for j in range(bits_per_band):
            hp = _arr_lit(d, _hyperplane(b * bits_per_band + j))
            dot = d.dot_bigint("qv", hp, DIM)
            bits.append(f"(CASE WHEN {dot} > 0 THEN {1 << j} ELSE 0 END)")
        key = " + ".join(bits)
        if d.name == "spark":
            band_structs.append(f"named_struct('band', {b}, 'k', CAST({key} AS BIGINT))")
        else:
            band_structs.append(f"{{'band': {b}, 'k': CAST({key} AS BIGINT)}}")
    arr = (
        f"array({', '.join(band_structs)})"
        if d.name == "spark"
        else f"[{', '.join(band_structs)}]"
    )
    dot_ab = d.dot_bigint("a.qv", "q.qv", DIM)
    return f"""
WITH e AS (SELECT vec_id, {_quant(d)} AS qv FROM embeddings),
en AS (SELECT vec_id, qv, {na} AS nrm, {arr} AS bandarr FROM e),
eb AS (
  SELECT vec_id, s.band AS band, s.k AS k
  FROM (SELECT vec_id, {d.unnest('bandarr')} AS s FROM en)
),
qid AS (SELECT min(vec_id) AS qv_id FROM en),
cand AS (
  SELECT DISTINCT a.vec_id
  FROM eb a JOIN eb b ON a.band = b.band AND a.k = b.k
  JOIN qid ON b.vec_id = qid.qv_id
  WHERE a.vec_id <> qid.qv_id
)
SELECT a.vec_id,
  CAST({dot_ab} AS DOUBLE) / sqrt(CAST(a.nrm AS DOUBLE) * CAST(q.nrm AS DOUBLE)) AS score
FROM cand c
JOIN en a ON c.vec_id = a.vec_id
JOIN en q ON q.vec_id = (SELECT qv_id FROM qid)
ORDER BY score DESC, a.vec_id
LIMIT {k}
""".strip()


def _runner(sql_builder):
    def run(spark, sf_dir: str):
        return run_sql(spark, sf_dir, sql_builder(SPARK), tables=("embeddings",), spread=("embeddings",))

    return run


QUERIES = {
    "sim_topk_bruteforce": (_runner(topk_bruteforce_sql), topk_bruteforce_sql(DUCKDB)),
    "sim_lsh_buckets": (_runner(lsh_buckets_sql), lsh_buckets_sql(DUCKDB)),
    "sim_lsh_ann_pairs": (_runner(lsh_ann_pairs_sql), lsh_ann_pairs_sql(DUCKDB)),
    "sim_lsh_topk": (_runner(lsh_topk_sql), lsh_topk_sql(DUCKDB)),
}
