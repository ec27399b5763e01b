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


def _arr_int(d: Dialect, vals) -> str:
    """Integer array literal (no quoting)."""
    body = ", ".join(str(int(v)) for v in vals)
    return f"array({body})" if d.name == "spark" else f"[{body}]"


def _arr_lit(d: Dialect, vals) -> str:
    body = ", ".join(str(v) for v in vals)
    return f"array({body})" if d.name == "spark" else f"[{body}]"


def topk_bruteforce_sql(d: Dialect, k: int = 10, q_offset: int = 0) -> str:
    """Exact cosine top-k. ``q_offset`` picks the (q_offset+1)-th smallest
    vec_id as the query vector (recall harnesses loop it; 0 — the
    CORRECTNESS entry — is the minimum, identical to the historical
    min(vec_id) form)."""
    dot = d.dot_bigint("a.qv", "q.qv", DIM)
    na = d.dot_bigint("a.qv", "a.qv", DIM)
    nq = d.dot_bigint("q.qv", "q.qv", DIM)
    return f"""
WITH e AS (SELECT vec_id, {_quant(d)} AS qv FROM embeddings),
qid AS (SELECT vec_id AS q_id FROM e ORDER BY vec_id LIMIT 1 OFFSET {q_offset}),
q AS (SELECT qv FROM e WHERE vec_id = (SELECT q_id FROM qid)),
scored AS (
  SELECT a.vec_id,
    CAST({dot} AS DOUBLE) / sqrt(CAST({na} AS DOUBLE) * CAST({nq} AS DOUBLE)) AS score
  FROM e a, q
  WHERE a.vec_id <> (SELECT q_id FROM qid)
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


def _lsh_en_ctes(d: Dialect, bits_per_band: int = 4, n_bands: int = 8) -> str:
    """The banded-embedding projection CTEs (``e`` → ``en`` with
    quantized vector, norm, and per-band cell keys) — one definition
    shared by the oracle's inline prefix and the Spark runner's staged
    view, so the banding rule cannot drift between them."""
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
    return (
        f"e AS (SELECT vec_id, {_quant(d)} AS qv FROM embeddings),\n"
        f"en AS (SELECT vec_id, qv, {na} AS nrm, {arr} AS bandarr FROM e)"
    )


def lsh_topk_sql(d: Dialect, k: int = 10, bits_per_band: int = 4,
                 n_bands: int = 8, multiprobe: int = 2,
                 en_tbl: str = "") -> str:
    """IVF/LSH-cell top-k: the query probes only vectors sharing at least
    one LSH band cell (candidates ~ corpus × per-band collision rate,
    never a full scan), then exact cosine ranks the candidates — the
    two-stage ANN serving shape. Bands reuse the first
    ``bits_per_band × n_bands`` hyperplanes; the exact variant
    (`sim_topk_bruteforce`) is the recall baseline.

    ``multiprobe``: also probe the cells at Hamming distance 1 from each
    query band key (flipping the ``multiprobe`` lowest bits) — widens
    only the QUERY's probe set, so index width/build cost are unchanged.
    Measured on the sf0.01 corpus (tools/ann_recall.py, recorded in
    BENCH/BASELINE.md): defaults (4 bits × 8 bands, 2 probes) reach
    recall@10 ≈ 0.95 while scanning ~7%% of the corpus; the r2 defaults
    (4×4, no probes) sat at 0.45.

    ``en_tbl``: name of a staged banded-embedding view (the build-once
    index table); empty renders the inline ``e``/``en`` prefix — the
    oracle's form, and the default."""
    dot_ab = d.dot_bigint("a.qv", "q.qv", DIM)
    en = en_tbl or "en"
    prefix = "" if en_tbl else _lsh_en_ctes(d, bits_per_band, n_bands) + ",\n"
    return f"""
WITH {prefix}eb AS (
  SELECT vec_id, s.band AS band, s.k AS k
  FROM (SELECT vec_id, {d.unnest('bandarr')} AS s FROM {en})
),
qid AS (SELECT min(vec_id) AS qv_id FROM {en}),
flips AS (SELECT {d.unnest(_arr_int(d, [0] + [1 << b for b in range(multiprobe)]))} AS m),
qcells AS (
  SELECT DISTINCT eb.band, {d.xor('eb.k', 'flips.m')} AS k
  FROM eb JOIN qid ON eb.vec_id = qid.qv_id CROSS JOIN flips
),
cand AS (
  SELECT DISTINCT a.vec_id
  FROM eb a JOIN qcells c ON a.band = c.band AND a.k = c.k
  CROSS JOIN qid
  WHERE a.vec_id <> qid.qv_id
)
SELECT a.vec_id,
  CAST({dot_ab} AS DOUBLE) / sqrt(CAST(a.nrm AS DOUBLE) * CAST(q.nrm AS DOUBLE)) AS score
FROM cand c
JOIN {en} a ON c.vec_id = a.vec_id
JOIN {en} q ON q.vec_id = (SELECT qv_id FROM qid)
ORDER BY score DESC, a.vec_id
LIMIT {k}
""".strip()


#: IVF defaults: 16 deterministic centroids, query probes its 4 nearest,
#: one Lloyd refinement (the CORRECTNESS-pinned configuration)
N_CENTROIDS = 16
N_PROBES = 4
N_ITERS = 1


def _ivf_cells_ctes(d: Dialect, n_centroids: int, n_iters: int = N_ITERS) -> str:
    """Shared CTE prefix: quantize → seed centroids → ``n_iters``
    integer-exact Lloyd refinements → assign every vector to its nearest
    centroid (its IVF cell).

    Scale shape (IVF-Flat, the FAISS/Milvus coarse quantizer): the
    centroid table is ``n_centroids`` rows — a broadcast; assignment is a
    cross join against the broadcast followed by two map-side-combining
    aggregates on vec_id (max score, then min c_id among ties — window
    free, so no n×C shuffle sort). Seeding is deterministic (md5-ordered
    sample of the corpus — the oracle picks the identical set); the
    Lloyd step recomputes each centroid as the element-wise mean of its
    assigned vectors — exactly the distributed k-means iteration
    (explode positions → map-side-combining sum/count per (cell, dim) →
    rebuild the array) — lifting recall ~10%% relative at equal probe
    fraction (measured sf0.01, BENCH/BASELINE.md). Determinism across
    engines: sums/counts are exact BIGINTs, the mean is
    floor(exact-double division) (both engines correctly round the
    division of exactly-representable ints, unlike their integer-div
    operators which disagree on negative floor-vs-trunc), scores are
    single IEEE divides of exact dot products, and score ties resolve to
    the smallest centroid id.
    """
    na = d.dot_bigint("qv", "qv", DIM)
    dot_cc = d.dot_bigint("cv", "cv", DIM)
    positions = d.unnest(d.sequence("0", str(DIM - 1)))
    cell_val = d.array_get("en.qv", "p.pos + 1")
    rebuild = d.array_agg_ordered("val", "pos")
    # internal CTE names carry an iv prefix so this prefix composes with
    # _pq_ctes in one statement (IVF-PQ) without name collisions; the
    # externally referenced names (en/scored/best/cells/seed) are stable
    parts = [
        f"ive AS (SELECT vec_id, {_quant(d)} AS qv FROM embeddings)",
        f"en AS (SELECT vec_id, qv, {na} AS nrm FROM ive)",
        f"""seed AS (
  SELECT vec_id AS c_id, qv AS cv, nrm AS cnrm
  FROM en ORDER BY {d.md5_int(d.s('vec_id'))}, vec_id LIMIT {n_centroids}
)""",
        "cent0 AS (SELECT c_id, cv, cnrm FROM seed)",
    ]
    for t in range(n_iters):
        ct = f"cent{t}"
        dot_t = d.dot_bigint("en.qv", f"{ct}.cv", DIM)
        parts += [
            f"""s{t} AS (
  SELECT en.vec_id, {ct}.c_id,
    CAST({dot_t} AS DOUBLE) / sqrt(CAST({ct}.cnrm AS DOUBLE)) AS score
  FROM en CROSS JOIN {ct}
)""",
            f"ivb{t} AS (SELECT vec_id, max(score) AS ms FROM s{t} GROUP BY vec_id)",
            f"""iva{t} AS (
  SELECT s.vec_id, min(s.c_id) AS c_id
  FROM s{t} s JOIN ivb{t} b ON s.vec_id = b.vec_id AND s.score = b.ms
  GROUP BY s.vec_id
)""",
            f"""ivlng{t} AS (
  SELECT iva{t}.c_id, p.pos, {cell_val} AS val
  FROM iva{t} JOIN en ON iva{t}.vec_id = en.vec_id
  CROSS JOIN (SELECT {positions} AS pos) p
)""",
            f"""ivupd{t} AS (
  SELECT c_id, pos,
    CAST(floor(CAST(sum(val) AS DOUBLE) / count(*)) AS BIGINT) AS val
  FROM ivlng{t} GROUP BY c_id, pos
)""",
            f"centl{t + 1} AS (SELECT c_id, {rebuild} AS cv FROM ivupd{t} GROUP BY c_id)",
            f"cent{t + 1} AS (SELECT c_id, cv, {dot_cc} AS cnrm FROM centl{t + 1})",
        ]
    cf = f"cent{n_iters}"
    dot_f = d.dot_bigint("en.qv", f"{cf}.cv", DIM)
    parts += [
        f"""scored AS (
  SELECT en.vec_id, {cf}.c_id,
    CAST({dot_f} AS DOUBLE) / sqrt(CAST({cf}.cnrm AS DOUBLE)) AS score
  FROM en CROSS JOIN {cf}
)""",
        "best AS (SELECT vec_id, max(score) AS ms FROM scored GROUP BY vec_id)",
        """cells AS (
  SELECT s.vec_id, min(s.c_id) AS c_id
  FROM scored s JOIN best b ON s.vec_id = b.vec_id AND s.score = b.ms
  GROUP BY s.vec_id
)""",
    ]
    return ",\n".join(parts)


def ivf_cells_sql(d: Dialect, n_centroids: int = N_CENTROIDS,
                  n_iters: int = N_ITERS) -> str:
    """IVF cell assignment: every vector labeled with its nearest
    deterministic centroid. The build side of `sim_ivf_topk`."""
    return f"""
WITH {_ivf_cells_ctes(d, n_centroids, n_iters)}
SELECT vec_id, c_id FROM cells
""".strip()


def ivf_topk_sql(d: Dialect, k: int = 10, n_centroids: int = N_CENTROIDS,
                 n_probes: int = N_PROBES, q_offset: int = 0,
                 n_iters: int = N_ITERS, en_tbl: str = "",
                 scored_tbl: str = "", cells_tbl: str = "") -> str:
    """IVF-Flat top-k: the query ranks only the vectors assigned to its
    ``n_probes`` nearest cells — the second ANN family next to the
    LSH-cell path (`sim_lsh_topk`); exact cosine then ranks candidates.
    Candidates ≈ corpus × n_probes / n_centroids regardless of corpus
    size; at scale the cells table is partitioned by c_id so a probe
    reads only its cells' partitions. ``q_offset`` picks the
    (q_offset+1)-th smallest vec_id as the query (recall measurement
    loops it; 0 = the CORRECTNESS entry).

    ``en_tbl``/``scored_tbl``/``cells_tbl``: staged index-view names
    for the Spark runner (build-once tables); empty renders the
    oracle's inline Lloyd prefix — the default."""
    dot_aq = d.dot_bigint("a.qv", "q.qv", DIM)
    en = en_tbl or "en"
    prefix = "" if en_tbl else f"{_ivf_cells_ctes(d, n_centroids, n_iters)},\n"
    return f"""
WITH {prefix}qid AS (SELECT vec_id AS q_id FROM {en} ORDER BY vec_id LIMIT 1 OFFSET {q_offset}),
{_ivf_probe_ctes(n_probes, scored_tbl or "scored", cells_tbl or "cells").rstrip().rstrip(',')}
SELECT a.vec_id,
  CAST({dot_aq} AS DOUBLE) / sqrt(CAST(a.nrm AS DOUBLE) * CAST(q.nrm AS DOUBLE)) AS score
FROM cand c
JOIN {en} a ON c.vec_id = a.vec_id
JOIN {en} q ON q.vec_id = (SELECT q_id FROM qid)
ORDER BY score DESC, a.vec_id
LIMIT {k}
""".strip()


# ---- product quantization (the ANN memory-compression path) ---------------

PQ_M = 4          #: subspaces (DIM/PQ_M dims each)
PQ_K = 8          #: codebook centroids per subspace
PQ_SUB = DIM // PQ_M


def _l2_bigint(d: Dialect, a: str, b: str, n: int) -> str:
    """Exact integer squared-L2 of two n-element BIGINT arrays."""
    if d.name == "spark":
        return (
            f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
            f"CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        )
    return (
        f"CAST(list_sum(list_transform(generate_series(1, {n}), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))) AS BIGINT)"
    )


def _pq_ctes(d: Dialect, m_sub: int = PQ_M, k_cb: int = PQ_K,
             n_iters: int = 2) -> str:
    """Shared CTE prefix: quantize → split into ``m_sub`` subspaces →
    deterministic per-subspace codebooks (md5-ordered seed +
    ``n_iters`` integer-exact Lloyd refinements) → per-subspace code
    assignment.

    Product quantization (Jégou et al., the FAISS PQ/IVF-PQ storage
    layer): at 100 TB of embeddings the full float vectors don't fit hot
    storage — codes are ``m_sub`` small ints per vector (64 float dims →
    4 codes here, a 16-64× footprint cut) and queries rank via a
    broadcast (m, c_id) distance table instead of reading vectors.

    Determinism: sub-vectors are exact BIGINT milli-units; distances are
    exact integer squared-L2 (no floats ANYWHERE in this operator — the
    strongest cross-engine guarantee in the module); assignment ties
    resolve to the smallest c_id; Lloyd means are floor(exact-double
    division) as in IVF. All joins against codebooks are broadcasts
    (m_sub × k_cb rows); everything else is map-side-combining
    aggregates keyed by (vec_id, m) or (m, c_id, pos).
    """
    return ",\n".join([
        f"e AS (SELECT vec_id, {_quant(d)} AS qv FROM embeddings)",
        f"ms AS (SELECT {d.unnest(d.sequence('0', str(m_sub - 1)))} AS m)",
        f"subs AS (SELECT vec_id, ms.m AS m, {_pq_sub_expr(d, m_sub)} AS sv"
        " FROM e CROSS JOIN ms)",
        _pq_codebook_ctes(d, m_sub, k_cb, n_iters, "e", "subs"),
        _pq_assign_ctes(d, m_sub, "subs", "cbf"),
    ])


def _pq_sub_expr(d: Dialect, m_sub: int) -> str:
    sub_w = DIM // m_sub
    return d.array_transform(
        d.sequence("1", str(sub_w)),
        f"i -> {d.array_get('qv', f'CAST(ms.m * {sub_w} + i AS INT)')}",
    )


def _pq_codebook_ctes(d: Dialect, m_sub: int, k_cb: int, n_iters: int,
                      e_tbl: str, subs_tbl: str) -> str:
    """seedv → cb0 → Lloyd iterations → ``cbf`` (the trained codebook),
    reading quantized vectors from ``e_tbl`` and subvectors from
    ``subs_tbl`` (inline CTEs for the oracle; staged temp views on the
    Spark side — Catalyst re-evaluates duplicate CTE references, the
    documented staging landmine)."""
    parts = [_pq_seed_ctes(d, k_cb, e_tbl, subs_tbl)]
    for t in range(n_iters):
        parts.append(_pq_lloyd_ctes(d, m_sub, subs_tbl, f"cb{t}", str(t)))
    parts.append(f"cbf AS (SELECT m, c_id, cv FROM cb{n_iters})")
    return ",\n".join(parts)


def _pq_seed_ctes(d: Dialect, k_cb: int, e_tbl: str, subs_tbl: str) -> str:
    return f"""seedv AS (
  SELECT vec_id, row_number() OVER (ORDER BY {d.md5_int(d.s('vec_id'))}, vec_id) AS c_id
  FROM {e_tbl} ORDER BY {d.md5_int(d.s('vec_id'))}, vec_id LIMIT {k_cb}
),
cb0 AS (
  SELECT s.m, seedv.c_id, s.sv AS cv
  FROM {subs_tbl} s JOIN seedv ON s.vec_id = seedv.vec_id
)"""


def _pq_lloyd_ctes(d: Dialect, m_sub: int, subs_tbl: str, cb_tbl: str,
                   t: str) -> str:
    """One Lloyd refinement (``cb{t}`` → ``cb{t+1}``) as CTEs; the Spark
    runner stages each pass (a CTE-chained multi-pass plan re-expands
    its upstream per reference — the kc_toast lineage-cut rule)."""
    sub_w = DIM // m_sub
    l2_t = _l2_bigint(d, "s.sv", "cb.cv", sub_w)
    positions = d.unnest(d.sequence("0", str(sub_w - 1)))
    cell_val = d.array_get("s.sv", "p.pos + 1")
    rebuild = d.array_agg_ordered("val", "pos")
    nxt = f"cb{int(t) + 1}" if t.isdigit() else "cbn"
    return f"""d{t} AS (
  SELECT s.vec_id, s.m, cb.c_id, {l2_t} AS dist
  FROM {subs_tbl} s JOIN {cb_tbl} cb ON s.m = cb.m
),
b{t} AS (SELECT vec_id, m, min(dist) AS md FROM d{t} GROUP BY vec_id, m),
a{t} AS (
  SELECT d.vec_id, d.m, min(d.c_id) AS c_id
  FROM d{t} d JOIN b{t} b ON d.vec_id = b.vec_id AND d.m = b.m AND d.dist = b.md
  GROUP BY d.vec_id, d.m
),
lng{t} AS (
  SELECT a{t}.m, a{t}.c_id, p.pos, {cell_val} AS val
  FROM a{t} JOIN {subs_tbl} s ON a{t}.vec_id = s.vec_id AND a{t}.m = s.m
  CROSS JOIN (SELECT {positions} AS pos) p
),
upd{t} AS (
  SELECT m, c_id, pos,
    CAST(floor(CAST(sum(val) AS DOUBLE) / count(*)) AS BIGINT) AS val
  FROM lng{t} GROUP BY m, c_id, pos
),
{nxt} AS (SELECT m, c_id, {rebuild} AS cv FROM upd{t} GROUP BY m, c_id)"""


def _pq_assign_ctes(d: Dialect, m_sub: int, subs_tbl: str, cbf_tbl: str) -> str:
    """df/bf → ``codes``: nearest-centroid assignment given a codebook."""
    l2_f = _l2_bigint(d, "s.sv", "cb.cv", DIM // m_sub)
    return f"""df AS (
  SELECT s.vec_id, s.m, cb.c_id, {l2_f} AS dist
  FROM {subs_tbl} s JOIN {cbf_tbl} cb ON s.m = cb.m
),
bf AS (SELECT vec_id, m, min(dist) AS md FROM df GROUP BY vec_id, m),
codes AS (
  SELECT d.vec_id, d.m, min(d.c_id) AS code
  FROM df d JOIN bf b ON d.vec_id = b.vec_id AND d.m = b.m AND d.dist = b.md
  GROUP BY d.vec_id, d.m
)"""


def pq_codes_sql(d: Dialect) -> str:
    """PQ encoding: every vector's per-subspace code — the compressed
    representation a 100 TB store persists in place of raw vectors."""
    return f"""
WITH {_pq_ctes(d)}
SELECT vec_id, m, code FROM codes
""".strip()


def pq_topk_sql(d: Dialect, k: int = 10, q_offset: int = 0,
                refine: int = 10) -> str:
    """PQ top-k with ADC shortlist → exact re-rank (the FAISS
    ``IndexRefine`` composition): the query precomputes one squared-L2
    per (subspace, centroid) — a ``PQ_M × PQ_K`` broadcast distance
    table — every vector's approximate distance is a broadcast join +
    map-side-combining sum over the CODES (no raw-vector reads), the
    best ``k × refine`` shortlist is then re-ranked by exact integer
    L2 against the raw vectors. At scale the shortlist is O(k·refine)
    regardless of corpus size, so the expensive exact pass touches a
    vanishing fraction; recall is bounded by whether true neighbors
    survive into the shortlist (floors pinned in tests/test_pq.py —
    ADC-only ranking is NOT enough when quantization residual rivals
    the NN distance; the refine stage is what makes PQ usable, which
    is why FAISS ships it). Exact integer arithmetic end to end; the
    production composition adds the IVF cell filter in front (IVF-PQ).
    """
    return f"""
WITH {_pq_ctes(d)},
{_pq_topk_tail(d, k, q_offset, refine, "e", "subs", "cbf", "codes")}
""".strip()


def _pq_topk_tail(d: Dialect, k: int, q_offset: int, refine: int,
                  e_tbl: str, subs_tbl: str, cbf_tbl: str,
                  codes_tbl: str, extra_ctes: str = "",
                  cand_tbl: str = "") -> str:
    """qid → query subvectors → ADC distance table → shortlist → exact
    re-rank; parameterized on table names so the oracle's inline CTEs
    and the Spark runner's staged views share one definition.

    ``extra_ctes``/``cand_tbl``: optional candidate pre-filter inserted
    after ``qid`` — the IVF-PQ composition scores only the codes whose
    vec_id survives ``cand_tbl`` (which must already exclude the query
    itself)."""
    l2_q = _l2_bigint(d, "qs.sv", "cb.cv", PQ_SUB)
    l2_full = _l2_bigint(d, "a.qv", "q.qv", DIM)
    if cand_tbl:
        cand_join = f"JOIN {cand_tbl} ON c.vec_id = {cand_tbl}.vec_id"
        self_filter = ""
    else:
        cand_join = "CROSS JOIN qid"
        self_filter = "\n  WHERE c.vec_id <> qid.q_id"
    return f"""qid AS (SELECT vec_id AS q_id FROM {e_tbl} ORDER BY vec_id LIMIT 1 OFFSET {q_offset}),
{extra_ctes}qs AS (SELECT s.m, s.sv FROM {subs_tbl} s JOIN qid ON s.vec_id = qid.q_id),
dtab AS (
  SELECT cb.m, cb.c_id, {l2_q} AS dist
  FROM {cbf_tbl} cb JOIN qs ON cb.m = qs.m
),
score AS (
  SELECT c.vec_id, CAST(sum(t.dist) AS BIGINT) AS adist
  FROM {codes_tbl} c
  {cand_join}
  JOIN dtab t ON c.m = t.m AND c.code = t.c_id{self_filter}
  GROUP BY c.vec_id
),
short AS (
  SELECT vec_id FROM score ORDER BY adist ASC, vec_id LIMIT {k * refine}
)
SELECT a.vec_id, {l2_full} AS dist
FROM short s
JOIN {e_tbl} a ON a.vec_id = s.vec_id
JOIN {e_tbl} q ON q.vec_id = (SELECT q_id FROM qid)
ORDER BY dist ASC, a.vec_id
LIMIT {k}"""


def _ivf_probe_ctes(n_probes: int, scored_tbl: str = "scored",
                    cells_tbl: str = "cells") -> str:
    """qprobe/cand CTEs over the IVF prefix's ``scored``/``cells``
    (candidates = vectors in the query's ``n_probes`` best cells, query
    excluded) — shared by the oracle and the Spark runner so the
    candidate rule cannot drift. ``scored_tbl``/``cells_tbl`` point the
    Spark runner at staged index views; the defaults render the
    oracle's inline-CTE names."""
    return f"""qprobe AS (
  SELECT s.c_id FROM {scored_tbl} s JOIN qid ON s.vec_id = qid.q_id
  ORDER BY s.score DESC, s.c_id LIMIT {n_probes}
),
cand AS (
  SELECT DISTINCT {cells_tbl}.vec_id
  FROM {cells_tbl} JOIN qprobe ON {cells_tbl}.c_id = qprobe.c_id
  CROSS JOIN qid WHERE {cells_tbl}.vec_id <> qid.q_id
),
"""


def ivf_pq_topk_sql(d: Dialect, k: int = 10, n_centroids: int = N_CENTROIDS,
                    n_probes: int = N_PROBES, q_offset: int = 0,
                    refine: int = 10, n_iters: int = N_ITERS) -> str:
    """IVF-PQ top-k (the FAISS ``IndexIVFPQ`` + refine composition — the
    shape a 100 TB vector store actually deploys): the IVF coarse
    quantizer prunes the corpus to the query's ``n_probes`` cells, PQ
    ADC scores ONLY those candidates from their compressed codes (no
    raw-vector reads), and the ``k × refine`` shortlist is re-ranked by
    exact integer L2.

    Scale: the scan is cut twice — cell pruning bounds candidates at
    ~corpus × n_probes / n_centroids, and the ADC pass over them reads
    ``PQ_M`` small ints per vector instead of the raw array; the exact
    pass touches O(k·refine) rows regardless of corpus size. Both index
    structures (cells, codes) are CDC-maintainable tables. Exact integer
    arithmetic throughout, ties to the smallest id — bit-identical in
    both engines.
    """
    return f"""
WITH {_ivf_cells_ctes(d, n_centroids, n_iters)},
{_pq_ctes(d)},
{_pq_topk_tail(d, k, q_offset, refine, "e", "subs", "cbf", "codes",
               extra_ctes=_ivf_probe_ctes(n_probes), cand_tbl="cand")}
""".strip()


def q_ivf_pq_topk(spark, sf_dir: str):
    """Spark runner: staged PQ views + staged IVF views (both build-once
    index tables); the probe/candidate CTEs and the ADC/refine tail are
    the same text the oracle runs, pointed at the staged names."""
    nm = _pq_stage_views(spark, sf_dir)
    iv = _ivf_stage_views(spark, sf_dir)
    return spark.sql(
        "WITH "
        + _pq_topk_tail(SPARK, 10, 0, 10,
                        nm["pq_e"], nm["pq_subs"], nm["pq_cbf"],
                        nm["pq_codes_v"],
                        extra_ctes=_ivf_probe_ctes(
                            N_PROBES, iv["ivf_scored"], iv["ivf_cells"]),
                        cand_tbl="cand")
    )


def _pq_view_names(sf_dir: str) -> dict:
    """Corpus-scoped PQ staging view names: the staged artifacts live in
    the session catalog, so the corpus identity must be IN the name — a
    session-global name plus an external memo would let a second sf_dir's
    staging silently overwrite the first's views while the memo still
    claims them fresh (:func:`_corpus_tag`)."""
    tag = _corpus_tag(sf_dir)
    return {v: f"{v}_{tag}" for v in ("pq_e", "pq_subs", "pq_cbf", "pq_codes_v")}


def _pq_stage_views(spark, sf_dir: str) -> dict:
    """Materialize the PQ build artifacts as localCheckpoint'd temp
    views (pq_e/pq_subs/pq_cbf/pq_codes_v, suffixed per corpus):
    Catalyst re-evaluates duplicate CTE references, so the subvector
    lambdas and the Lloyd chain would otherwise re-run once per
    reference (the module's documented staging rule). In production
    these ARE the persisted PQ index tables — codes and codebook are
    written once and served many queries, exactly this split.

    The build-once memo is the session catalog itself (does the scoped
    final view exist?), so it is exact per (session, corpus) — no
    ``id(spark)`` reuse hazard, and distinct sf_dirs never collide."""
    from pypgoutput_spark.operators.qlib import register_views

    nm = _pq_view_names(sf_dir)
    if spark.catalog.tableExists(nm["pq_codes_v"]):
        return nm
    register_views(spark, sf_dir, ("embeddings",))
    d = SPARK
    e = spark.sql(f"SELECT vec_id, {_quant(d)} AS qv FROM embeddings").localCheckpoint()
    e.createOrReplaceTempView(nm["pq_e"])
    spark.sql(
        f"SELECT vec_id, ms.m AS m, {_pq_sub_expr(d, PQ_M)} AS sv FROM {nm['pq_e']} "
        f"CROSS JOIN (SELECT {d.unnest(d.sequence('0', str(PQ_M - 1)))} AS m) ms"
    ).localCheckpoint().createOrReplaceTempView(nm["pq_subs"])
    # seed folded INTO the first Lloyd pass: cb0 is referenced exactly
    # once (d0's join), so inlining re-evaluates nothing and saves one
    # checkpoint job of the staging chain
    cb = spark.sql(
        f"WITH {_pq_seed_ctes(d, PQ_K, nm['pq_e'], nm['pq_subs'])},\n"
        f"{_pq_lloyd_ctes(d, PQ_M, nm['pq_subs'], 'cb0', '0')} "
        "SELECT m, c_id, cv FROM cb1"
    ).localCheckpoint()
    # second staged Lloyd pass (lineage cut per pass)
    cb.createOrReplaceTempView("pq_cb_cur")
    cb = spark.sql(
        f"WITH {_pq_lloyd_ctes(d, PQ_M, nm['pq_subs'], 'pq_cb_cur', 'x')} "
        "SELECT m, c_id, cv FROM cbn"
    ).localCheckpoint()
    cb.createOrReplaceTempView(nm["pq_cbf"])
    spark.sql(
        f"WITH {_pq_assign_ctes(d, PQ_M, nm['pq_subs'], nm['pq_cbf'])} "
        "SELECT vec_id, m, code FROM codes"
    ).localCheckpoint().createOrReplaceTempView(nm["pq_codes_v"])
    return nm


def _corpus_tag(sf_dir: str) -> str:
    """Corpus-identity suffix for staged view names: the corpus must be
    IN the name (one session may serve several sf_dirs) — shared by the
    PQ and LSH/IVF staging so the identity rule cannot drift."""
    import hashlib

    return hashlib.md5(sf_dir.encode("utf-8")).hexdigest()[:8]


def _ann_view_names(sf_dir: str) -> dict:
    """Corpus-scoped LSH/IVF staging view names (:func:`_corpus_tag`)."""
    tag = _corpus_tag(sf_dir)
    return {v: f"{v}_{tag}"
            for v in ("lsh_en", "ivf_en", "ivf_scored", "ivf_cells")}


def _lsh_stage_views(spark, sf_dir: str) -> dict:
    """Stage the banded-embedding projection (``en``: vec_id, qv, nrm,
    bandarr) as a localCheckpoint'd view. Catalyst inlines WITH-CTEs, so
    the inline form re-evaluates the 32 hyperplane dot products once per
    ``en`` reference (three in `sim_lsh_topk` — measured 4.1 s warm vs
    0.4 s over the staged view at sf0.1). In production this IS the
    persisted LSH index table — banded once, probed by every query —
    exactly the split `_pq_stage_views` already applies to PQ."""
    from pypgoutput_spark.operators.qlib import register_views

    nm = _ann_view_names(sf_dir)
    if spark.catalog.tableExists(nm["lsh_en"]):
        return nm
    register_views(spark, sf_dir, ("embeddings",), spread=("embeddings",))
    spark.sql(
        f"WITH {_lsh_en_ctes(SPARK)} SELECT vec_id, qv, nrm, bandarr FROM en"
    ).localCheckpoint().createOrReplaceTempView(nm["lsh_en"])
    return nm


def _ivf_stage_views(spark, sf_dir: str) -> dict:
    """Stage the IVF index artifacts — ``en`` (quantized + norm),
    ``scored`` (vec × final-centroid cosine), ``cells`` (vec → cell) —
    as localCheckpoint'd views: the inline form re-runs the whole
    Lloyd chain per CTE reference (`sim_ivf_topk` references the
    prefix 4×). In production centroids and cell assignments ARE
    persisted index tables maintained by CDC, served to many queries.
    ``cells`` is derived from the STAGED ``scored`` with the same
    max-score/min-c_id text as the inline CTE, so the assignment rule
    cannot drift."""
    from pypgoutput_spark.operators.qlib import register_views

    nm = _ann_view_names(sf_dir)
    if spark.catalog.tableExists(nm["ivf_cells"]):
        return nm
    register_views(spark, sf_dir, ("embeddings",), spread=("embeddings",))
    d = SPARK
    na = d.dot_bigint("qv", "qv", DIM)
    spark.sql(
        f"WITH ive AS (SELECT vec_id, {_quant(d)} AS qv FROM embeddings) "
        f"SELECT vec_id, qv, {na} AS nrm FROM ive"
    ).localCheckpoint().createOrReplaceTempView(nm["ivf_en"])
    spark.sql(
        f"WITH {_ivf_cells_ctes(d, N_CENTROIDS, N_ITERS)} "
        "SELECT vec_id, c_id, score FROM scored"
    ).localCheckpoint().createOrReplaceTempView(nm["ivf_scored"])
    spark.sql(f"""
WITH best AS (SELECT vec_id, max(score) AS ms FROM {nm['ivf_scored']} GROUP BY vec_id)
SELECT s.vec_id, min(s.c_id) AS c_id
FROM {nm['ivf_scored']} s JOIN best b ON s.vec_id = b.vec_id AND s.score = b.ms
GROUP BY s.vec_id
""".strip()).localCheckpoint().createOrReplaceTempView(nm["ivf_cells"])
    return nm


def q_lsh_topk(spark, sf_dir: str):
    nm = _lsh_stage_views(spark, sf_dir)
    return spark.sql(lsh_topk_sql(SPARK, en_tbl=nm["lsh_en"]))


def q_ivf_cells(spark, sf_dir: str):
    nm = _ivf_stage_views(spark, sf_dir)
    return spark.sql(f"SELECT vec_id, c_id FROM {nm['ivf_cells']}")


def q_ivf_topk(spark, sf_dir: str):
    nm = _ivf_stage_views(spark, sf_dir)
    return spark.sql(ivf_topk_sql(
        SPARK, en_tbl=nm["ivf_en"], scored_tbl=nm["ivf_scored"],
        cells_tbl=nm["ivf_cells"]))


def q_pq_codes(spark, sf_dir: str):
    nm = _pq_stage_views(spark, sf_dir)
    return spark.sql(f"SELECT vec_id, m, code FROM {nm['pq_codes_v']}")


def q_pq_topk(spark, sf_dir: str):
    nm = _pq_stage_views(spark, sf_dir)
    return spark.sql(
        "WITH " + _pq_topk_tail(SPARK, 10, 0, 10,
                                nm["pq_e"], nm["pq_subs"], nm["pq_cbf"],
                                nm["pq_codes_v"])
    )


def _runner(sql_builder):
    def run(spark, sf_dir: str):
        return run_sql(spark, sf_dir, sql_builder(SPARK), tables=("embeddings",), spread=("embeddings",))

    return run


QUERIES = {
    "sim_topk_bruteforce": (_runner(topk_bruteforce_sql), topk_bruteforce_sql(DUCKDB)),
    "sim_lsh_buckets": (_runner(lsh_buckets_sql), lsh_buckets_sql(DUCKDB)),
    "sim_lsh_ann_pairs": (_runner(lsh_ann_pairs_sql), lsh_ann_pairs_sql(DUCKDB)),
    "sim_lsh_topk": (q_lsh_topk, lsh_topk_sql(DUCKDB)),
    "sim_ivf_cells": (q_ivf_cells, ivf_cells_sql(DUCKDB)),
    "sim_ivf_topk": (q_ivf_topk, ivf_topk_sql(DUCKDB)),
    "sim_pq_codes": (q_pq_codes, pq_codes_sql(DUCKDB)),
    "sim_pq_topk": (q_pq_topk, pq_topk_sql(DUCKDB)),
    "sim_ivf_pq_topk": (q_ivf_pq_topk, ivf_pq_topk_sql(DUCKDB)),
}


def write_clustered_embeddings(path: str, n: int = 4000, dim: int = DIM,
                               n_clusters: int = 16, spread: float = 0.06,
                               seed: int = 7) -> str:
    """Deterministic Gaussian-mixture embedding fixture: unit-norm cluster
    centers, per-point noise sigma=``spread``. Written as
    ``{path}/embeddings.parquet`` in the standard (vec_id, embedding,
    label) schema, so every ANN harness runs on it unchanged. The
    driver's synthetic corpus is deliberately near-uniform (no structure
    for a coarse quantizer to exploit — the IVF recall ceiling there is
    corpus-limited); this fixture is the clustered regime where IVF's
    probe pruning actually wins, and BENCH/BASELINE.md records both."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, n_clusters, size=n)
    x = (centers[assign] + spread * rng.normal(size=(n, dim))).astype(np.float32)
    os.makedirs(path, exist_ok=True)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(x), pa.list_(pa.float32())),
            "label": pa.array(assign.astype(np.int32)),
        }
    )
    pq.write_table(tbl, os.path.join(path, "embeddings.parquet"))
    return path


def ivf_recall_at_k(sf_dir: str, k: int = 10, n_centroids: int = N_CENTROIDS,
                    n_probes: int = N_PROBES, n_queries: int = 20,
                    n_iters: int = N_ITERS) -> dict:
    """Measured recall@k of `sim_ivf_topk` against exact brute-force
    cosine, looping the query selector over the ``n_queries`` smallest
    vec_ids. Runs the operator's own SQL through DuckDB — representative
    for the Spark plan because the CORRECTNESS gate hash-verifies both
    dialects produce identical rows for the same SQL builders.

    Returns {"recall_at_k", "mean_candidates", "corpus", ...params}.
    """
    import duckdb

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    corpus = con.sql("SELECT count(*) FROM embeddings").fetchall()[0][0]
    d = DUCKDB
    recalls, cands = [], []
    for off in range(n_queries):
        gt = {r[0] for r in con.sql(topk_bruteforce_sql(d, k, q_offset=off)).fetchall()}
        got = {
            r[0]
            for r in con.sql(
                ivf_topk_sql(d, k, n_centroids, n_probes, q_offset=off, n_iters=n_iters)
            ).fetchall()
        }
        recalls.append(len(got & gt) / float(k))
        cand_sql = f"""
WITH {_ivf_cells_ctes(d, n_centroids, n_iters)},
qid AS (SELECT vec_id AS q_id FROM en ORDER BY vec_id LIMIT 1 OFFSET {off}),
{_ivf_probe_ctes(n_probes).rstrip().rstrip(',')}
SELECT count(*) FROM cand"""
        cands.append(con.sql(cand_sql).fetchall()[0][0])
    return {
        "recall_at_k": round(sum(recalls) / len(recalls), 4),
        "k": k,
        "n_centroids": n_centroids,
        "n_probes": n_probes,
        "n_iters": n_iters,
        "n_queries": n_queries,
        "corpus": corpus,
        "mean_candidates": round(sum(cands) / float(len(cands)), 1),
    }


def ann_recall_at_k(spark, sf_dir: str, k: int = 10, bits_per_band: int = 4,
                    n_bands: int = 4, n_queries: int = 20,
                    multiprobe: int = 0) -> dict:
    """Measured recall@k of the LSH-cell two-stage ANN (`sim_lsh_topk`
    shape) against exact brute-force cosine, over the first ``n_queries``
    vectors as queries — entirely in Spark, with the operator's own
    quantization, hyperplanes, and tie-break (score DESC, vec_id).

    ``multiprobe``: additionally probe the cells at Hamming distance 1
    from each of the query's band keys, flipping the ``multiprobe``
    lowest bits per band (0 = exact cells only). Multi-probe raises
    recall at fixed index width by widening only the QUERY's probe set —
    the indexed corpus side is untouched, so index size and build cost
    are unchanged (the standard trade in IVF/LSH serving).

    Returns {"recall": float, "mean_candidates": float, ...params}.
    """
    from pyspark.sql import functions as F

    from pypgoutput_spark.operators.qlib import register_views

    d = SPARK
    register_views(spark, sf_dir, ("embeddings",), spread=("embeddings",))
    na = d.dot_bigint("qv", "qv", DIM)
    band_structs = []
    for b in range(n_bands):
        bits = []
        for j in range(bits_per_band):
            hp = _arr_lit(d, _hyperplane(b * bits_per_band + j))
            dot = d.dot_bigint("qv", hp, DIM)
            bits.append(f"(CASE WHEN {dot} > 0 THEN {1 << j} ELSE 0 END)")
        key = " + ".join(bits)
        band_structs.append(f"named_struct('band', {b}, 'k', CAST({key} AS BIGINT))")
    arr = f"array({', '.join(band_structs)})"

    en = spark.sql(
        f"SELECT vec_id, {_quant(d)} AS qv FROM embeddings"
    ).selectExpr("vec_id", "qv", f"{na} AS nrm", f"{arr} AS bandarr")
    # stage the band arrays once: higher-order lambdas are interpreted,
    # and the explode below would otherwise re-evaluate them per consumer
    # (lineage cut honors a configured reliable checkpoint dir — staging)
    from pypgoutput_spark.operators.staging import stage as _stage

    en = _stage(en)
    eb = en.selectExpr("vec_id", "inline(bandarr)").withColumnRenamed("k", "cell")

    qs = _stage(
        en.orderBy("vec_id").limit(n_queries).selectExpr(
            "vec_id AS q_id", "qv AS q_qv", "nrm AS q_nrm"
        )
    )

    dot_aq = d.dot_bigint("a.qv", "q.q_qv", DIM)
    bf = (
        en.alias("a").join(qs.alias("q"), F.expr("a.vec_id <> q.q_id"))
        .selectExpr(
            "q.q_id", "a.vec_id",
            f"CAST({dot_aq} AS DOUBLE) / sqrt(CAST(a.nrm AS DOUBLE) * CAST(q.q_nrm AS DOUBLE)) AS score",
        )
        .selectExpr(
            "q_id", "vec_id",
            "row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn",
        )
        .filter(f"rn <= {k}")
    )

    # query probe cells (exact + optional 1-bit multiprobe flips)
    qb = eb.join(qs, eb["vec_id"] == qs["q_id"]).select("q_id", "band", "cell")
    if multiprobe > 0:
        flips = qb
        for bit in range(multiprobe):
            flips = flips.unionByName(
                qb.selectExpr("q_id", "band", f"CAST(cell ^ {1 << bit} AS BIGINT) AS cell")
            )
        qb = flips.distinct()
    cand = (
        eb.alias("a")
        .join(qb.alias("p"), F.expr("a.band = p.band AND a.cell = p.cell AND a.vec_id <> p.q_id"))
        .select("p.q_id", "a.vec_id")
        .distinct()
    )
    cand = _stage(cand)
    n_cand = cand.count()
    lsh = (
        cand.alias("c")
        .join(en.alias("a"), F.expr("c.vec_id = a.vec_id"))
        .join(qs.alias("q"), F.expr("c.q_id = q.q_id"))
        .selectExpr(
            "c.q_id AS q_id", "a.vec_id",
            f"CAST({dot_aq} AS DOUBLE) / sqrt(CAST(a.nrm AS DOUBLE) * CAST(q.q_nrm AS DOUBLE)) AS score",
        )
        .selectExpr(
            "q_id", "vec_id",
            "row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn",
        )
        .filter(f"rn <= {k}")
    )
    hits = bf.join(lsh, ["q_id", "vec_id"], "left_semi").groupBy("q_id").count()
    per_q = {r["q_id"]: r["count"] for r in hits.collect()}
    n_q = qs.count()
    recall = sum(per_q.get(q, 0) for q in per_q) / float(k * n_q)
    return {
        "recall_at_k": round(recall, 4),
        "k": k,
        "bits_per_band": bits_per_band,
        "n_bands": n_bands,
        "multiprobe": multiprobe,
        "n_queries": n_q,
        "mean_candidates": round(n_cand / float(n_q), 1),
    }
