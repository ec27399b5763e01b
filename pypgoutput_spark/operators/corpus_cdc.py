"""CDC-maintained training corpus: the two halves of this engine joined.

Every other CDC entry replays the fixed 5-column ``repo_files`` relation;
this one proves the pipeline is SCHEMA-GENERAL end to end by running a
``documents``-shaped relation (the corpus tables the training-data
operators consume) through the identical decode → LWW → merge-on-read
path: a deterministic WAL stream derived from the sf_dir's documents
table — insert every document, revise a drawn 25%, delete a drawn 10% —
is encoded with the GENERIC pgoutput codecs (wal.codec.encode_*, not the
generator's specialized repo_files encoder), ingested into a LakeTable
keyed on doc_id, and the final resolved state feeds a per-document
token-count/sha manifest (the corpus-op handoff).

The DuckDB oracle never sees a WAL byte: it applies the same md5 draws
directly to the documents table (update-then-delete semantics in SQL),
so a hash match verifies decode + transaction stamping + LWW + MOR
resolution for a second, differently-shaped relation.

Scale: the entry ingests in 4 micro-batches, one per WAL segment
(decode parallelism = segments, as in production; the segment-split
batch cut yields exactly one batch per segment here); the Spark-free pandas encode
of the synthetic stream is test-fixture cost, not engine cost — a real
deployment's frames arrive from the receiver/walsock seams.

Reference scope: the reference pipeline is relation-agnostic by design
(reference reader.py:63-98 builds models from any Relation message);
this entry pins the same property for the Spark re-expression.
"""

from __future__ import annotations

import hashlib
import tempfile

from pypgoutput_spark.functions.detsql import DUCKDB, SPARK, Dialect

#: relation identity for the synthetic documents stream
REL_ID = 7001
#: md5 draw percentages: revised docs, deleted docs (independent draws)
UPD_PCT, DEL_PCT = 25, 10
#: text appended by the revision update
REV_SUFFIX = " rev2 corpus update"
#: documents stream splits into this many WAL segments (decode tasks)
N_SEGMENTS = 4

COLUMNS = ("doc_id", "text", "lang", "source", "n_chars")


def _draw(tag: str, doc_id) -> int:
    """md5_int(concat('<tag>:', CAST(doc_id AS VARCHAR))) % 100 — the
    Python twin of the in-SQL draw (15 hex chars, identical in DuckDB,
    Spark, and here)."""
    h = hashlib.md5(f"{tag}:{doc_id}".encode()).hexdigest()[:15]
    return int(h, 16) % 100


def _sql_draw(d: Dialect, tag: str) -> str:
    arg = "concat('" + tag + ":', " + d.s("doc_id") + ")"
    return f"({d.md5_int(arg)} % 100)"


def encode_documents_frames(sf_dir: str):
    """Deterministic WAL frames (pandas) for the documents stream: one
    Relation message, then per segment one transaction containing the
    segment's inserts / revisions / deletions in doc_id order."""
    import duckdb
    import pandas as pd

    from pypgoutput_spark.wal import codec

    docs = (
        duckdb.connect()
        .execute(
            "SELECT doc_id, text, lang, source, n_chars FROM "
            f"read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
        )
        .df()
    )
    n = len(docs)
    q = (n + N_SEGMENTS - 1) // N_SEGMENTS  # docs per segment
    rows = []
    rel = codec.encode_relation(
        REL_ID, "public", "documents", "d",
        [(1, "doc_id", 20, -1), (0, "text", 25, -1), (0, "lang", 25, -1),
         (0, "source", 25, -1), (0, "n_chars", 20, -1)],
    )
    rows.append({"segment": 0, "lsn": 1, "mtype": "R", "payload": rel})

    def _cell(v):
        # SQL NULL rides the wire as an 'n' cell (never the string
        # 'None'/'nan' — the generic codec supports null cells and the
        # oracle preserves NULL); pandas surfaces parquet NULLs as
        # None/NaN depending on dtype
        if v is None or (isinstance(v, float) and v != v):
            return ("n", None)
        return ("t", str(v))

    def cells(doc_id, text, lang, source):
        n_chars = None if text is None else len(text)
        return [_cell(doc_id), _cell(text), _cell(lang),
                _cell(source), _cell(n_chars)]

    key_only = lambda doc_id: [  # noqa: E731 — K image: key cell + NULLs
        ("t", str(doc_id)), ("n", None), ("n", None), ("n", None), ("n", None)
    ]

    seg_span = 4 * q + 2  # B + up to 3 events per doc (slot 4th spare) + C
    for r, row in enumerate(docs.itertuples(index=False)):
        seg, r0 = r // q, r % q
        base = 10 + seg_span * seg
        if r0 == 0:  # open the segment's transaction
            rows.append({
                "segment": seg, "lsn": base, "mtype": "B",
                "payload": codec.encode_begin(base, seg * 1_000_000, 9000 + seg),
            })
        ev = base + 1 + 4 * r0
        rows.append({
            "segment": seg, "lsn": ev, "mtype": "I",
            "payload": codec.encode_insert(
                REL_ID, cells(row.doc_id, row.text, row.lang, row.source)
            ),
        })
        if _draw("docu", row.doc_id) < UPD_PCT:
            # NULL || suffix is NULL in SQL — mirror it (oracle parity)
            rev = None if row.text is None else row.text + REV_SUFFIX
            rows.append({
                "segment": seg, "lsn": ev + 1, "mtype": "U",
                "payload": codec.encode_update(
                    REL_ID, cells(row.doc_id, rev, row.lang, row.source),
                ),
            })
        if _draw("docd", row.doc_id) < DEL_PCT:
            rows.append({
                "segment": seg, "lsn": ev + 2, "mtype": "D",
                "payload": codec.encode_delete(REL_ID, key_only(row.doc_id), "K"),
            })
        if r0 == q - 1 or r == n - 1:  # close the segment's transaction
            c = base + 1 + 4 * q
            rows.append({
                "segment": seg, "lsn": c, "mtype": "C",
                "payload": codec.encode_commit(c - 1, c, seg * 1_000_000),
            })
    return pd.DataFrame(rows)


def q_documents_corpus(spark, sf_dir: str):
    from pypgoutput_spark.lake.table import LakeTable
    from pypgoutput_spark.streaming import pipeline as _pipeline
    from pypgoutput_spark.wal.generator import FRAMES_SCHEMA

    frames = spark.createDataFrame(
        encode_documents_frames(sf_dir), schema=FRAMES_SCHEMA
    )
    tmp = tempfile.mkdtemp(prefix="pypgoutput_spark_docs_")
    table = LakeTable.create(
        spark, f"{tmp}/lake",
        schema=[(c, "string") for c in COLUMNS],
        key_cols=["doc_id"], n_buckets=8,
    )
    _pipeline.run_ingest(spark, frames, table, relation_id=REL_ID, n_batches=4)
    d = SPARK
    final = table.read()
    final.createOrReplaceTempView("cdc_docs_final")
    return spark.sql(f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id, source, lang,
  CAST(n_chars AS BIGINT) AS n_chars,
  {d.array_len(d.split_ws('text'))} AS n_tokens,
  sha2(text, 256) AS text_sha
FROM cdc_docs_final
""".strip())


def documents_corpus_oracle(d: Dialect = DUCKDB) -> str:
    """No WAL: the same draws applied straight to the documents table."""
    sha = "sha256(t2)" if d.name == "duckdb" else "sha2(t2, 256)"
    return f"""
WITH drawn AS (
  SELECT doc_id, source, lang, text,
    ({_sql_draw(d, 'docu')} < {UPD_PCT}) AS upd,
    ({_sql_draw(d, 'docd')} < {DEL_PCT}) AS del
  FROM documents
),
final AS (
  SELECT doc_id, source, lang,
    CASE WHEN upd THEN text || '{REV_SUFFIX}' ELSE text END AS t2
  FROM drawn WHERE NOT del
)
SELECT doc_id, source, lang,
  CAST(length(t2) AS BIGINT) AS n_chars,
  {d.array_len(d.split_ws('t2'))} AS n_tokens,
  {sha} AS text_sha
FROM final
""".strip()


QUERIES = {
    "cdc_documents_corpus": (q_documents_corpus, documents_corpus_oracle()),
}
