"""LSH parameterization: non-default bucket widths / band counts stay
oracle-exact (VERDICT r1 #8 — bits/bands must be sizeable per corpus)."""

from __future__ import annotations

import os

import duckdb
import pytest

from pypgoutput_spark.operators import dedup, similarity
from pypgoutput_spark.operators.qlib import run_sql

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="testdata sf0.001 missing"
)


def _duck(sf_dir: str, sql: str):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con.execute(sql).fetchdf()


def _compare(spark_df, duck_df, keys):
    got = spark_df.toPandas().sort_values(keys).reset_index(drop=True)
    want = duck_df.sort_values(keys).reset_index(drop=True)
    assert len(got) == len(want)
    got = got[want.columns.tolist()]
    for c in want.columns:
        assert got[c].tolist() == want[c].tolist(), f"column {c}"


def test_minhash_lsh_custom_k_bands(spark):
    k, bands = 16, 8  # vs defaults 12, 4
    got = dedup.q_minhash_lsh_pairs(spark, SF_DIR, k=k, n_bands=bands)
    want = _duck(SF_DIR, dedup.minhash_lsh_sql(dedup.DUCKDB, k=k, n_bands=bands))
    _compare(got, want, ["doc_a", "doc_b"])


def test_minhash_signatures_custom_k(spark):
    k, bands = 6, 3
    got = dedup.q_minhash_signatures(spark, SF_DIR, k=k, n_bands=bands)
    want = _duck(SF_DIR, dedup.minhash_signatures_sql(dedup.DUCKDB, k=k, n_bands=bands))
    _compare(got, want, ["doc_id"])


def test_sim_lsh_custom_plane_count(spark):
    n_planes = similarity.n_planes_for(50)  # 10 bits for a 50-vector corpus
    assert n_planes == 10
    got = run_sql(
        spark, SF_DIR,
        similarity.lsh_buckets_sql(similarity.SPARK, n_planes=n_planes),
        tables=("embeddings",),
    )
    want = _duck(SF_DIR, similarity.lsh_buckets_sql(similarity.DUCKDB, n_planes=n_planes))
    _compare(got, want, ["vec_id"])


def test_embedding_ann_custom_bands(spark):
    bits, bands = 6, 4  # vs defaults 4, 6
    got = dedup.q_embedding_cosine(spark, SF_DIR, bits_per_band=bits, n_bands=bands)
    want = _duck(
        SF_DIR,
        dedup.embedding_cosine_sql(dedup.DUCKDB, bits_per_band=bits, n_bands=bands),
    )
    _compare(got, want, ["vec_a", "vec_b"])


def test_n_planes_for_scaling_bound():
    """bits ≈ log2(n) + 4 keeps expected bucket occupancy ~1/16 as the
    corpus grows; clamped to [8, 32]."""
    assert similarity.n_planes_for(10) == 8
    assert similarity.n_planes_for(1_000) == 14
    assert similarity.n_planes_for(1_000_000) == 24
    assert similarity.n_planes_for(10**12) == 32  # clamp

    k, b = dedup.minhash_params(1_000_000, jaccard_threshold=0.5)
    assert k == b * 3 and 2 <= b <= 32
