"""Operator modules.

CDC core: decode (frames → events), lww (last-write-wins collapse),
merge (lake MERGE). Training-data suite: dedup, similarity, text,
multimodal, analytics — each exposing QUERIES = {name: (spark_fn,
duckdb_oracle_sql)}.
"""
