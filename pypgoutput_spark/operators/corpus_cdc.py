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
import os
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


def _sql_draw_col(d: Dialect, tag: str, col: str) -> str:
    arg = "concat('" + tag + ":', " + d.s(col) + ")"
    return f"({d.md5_int(arg)} % 100)"


def _sql_draw(d: Dialect, tag: str) -> str:
    return _sql_draw_col(d, tag, "doc_id")


def _cell(v):
    # SQL NULL rides the wire as an 'n' cell (never the string
    # 'None'/'nan' — the generic codec supports null cells and the
    # oracle preserves NULL); pandas surfaces parquet NULLs as
    # None/NaN depending on dtype
    if v is None or (isinstance(v, float) and v != v):
        return ("n", None)
    return ("t", str(v))


def _row_frames(row, r: int, n: int, q: int, seg_span: int, rel_id: int,
                insert_cells, upd_cells, del_cells,
                upd_draw, del_draw, upd_pct: int, del_pct: int,
                xid_base: int) -> list:
    """Frames contributed by global row ``r`` — ROW-LOCAL given (r, n, q):
    the segment's Begin rides the first row, its Commit the last, so the
    encode parallelizes over arbitrary row partitions with no cross-row
    state. ONE implementation under both the driver-side and distributed
    encoders so an LSN-layout change cannot desynchronize them."""
    from pypgoutput_spark.wal import codec

    out = []
    seg, r0 = r // q, r % q
    base = 10 + seg_span * seg
    if r0 == 0:  # open the segment's transaction
        out.append({
            "segment": seg, "lsn": base, "mtype": "B",
            "payload": codec.encode_begin(base, seg * 1_000_000, xid_base + seg),
        })
    ev = base + 1 + 4 * r0
    out.append({
        "segment": seg, "lsn": ev, "mtype": "I",
        "payload": codec.encode_insert(rel_id, insert_cells(row)),
    })
    if upd_draw(row) < upd_pct:
        out.append({
            "segment": seg, "lsn": ev + 1, "mtype": "U",
            "payload": codec.encode_update(rel_id, upd_cells(row)),
        })
    if del_draw(row) < del_pct:
        out.append({
            "segment": seg, "lsn": ev + 2, "mtype": "D",
            "payload": codec.encode_delete(rel_id, del_cells(row), "K"),
        })
    if r0 == q - 1 or r == n - 1:  # close the segment's transaction
        c = base + 1 + 4 * q
        out.append({
            "segment": seg, "lsn": c, "mtype": "C",
            "payload": codec.encode_commit(c - 1, c, seg * 1_000_000),
        })
    return out


def _encode_stream(rows_df, rel_id: int, rel_name: str, rel_cols,
                   insert_cells, upd_cells, del_cells,
                   upd_draw, del_draw, upd_pct: int, del_pct: int,
                   n_segments: int, xid_base: int):
    """Shared WAL-stream framing for the CDC-integration fixtures: one
    Relation message, then per segment one transaction whose events are
    the rows' inserts plus draw-gated revision updates and deletions —
    4 LSN slots per row (I, U?, D?, spare), B/C never straddling a
    segment. Driver-side (pandas) form; :func:`_encode_stream_spark`
    runs the identical per-row emitter (:func:`_row_frames`) on
    executors for large sources."""
    import pandas as pd

    from pypgoutput_spark.wal import codec

    n = len(rows_df)
    q = (n + n_segments - 1) // n_segments  # rows per segment
    out = []
    rel = codec.encode_relation(rel_id, "public", rel_name, "d", rel_cols)
    out.append({"segment": 0, "lsn": 1, "mtype": "R", "payload": rel})
    seg_span = 4 * q + 2  # B + up to 3 events per row (4th slot spare) + C
    for r, row in enumerate(rows_df.itertuples(index=False)):
        out.extend(_row_frames(
            row, r, n, q, seg_span, rel_id, insert_cells, upd_cells,
            del_cells, upd_draw, del_draw, upd_pct, del_pct, xid_base,
        ))
    return pd.DataFrame(out)


def _encode_stream_spark(spark, rows_df, n_rows: int, order_col: str,
                         rel_id: int, rel_name: str, rel_cols,
                         insert_cells, upd_cells, del_cells,
                         upd_draw, del_draw, upd_pct: int, del_pct: int,
                         n_segments: int, xid_base: int):
    """Distributed twin of :func:`_encode_stream`: the per-row encode —
    thousands of struct-packs per 100k rows, pure Python — runs on
    EXECUTORS via mapInPandas instead of serially on the driver (guide
    §4: the driver does no data work; the row→frames emitter is
    row-local given the global row number, so any partitioning works).
    Byte-identical output: the same :func:`_row_frames` emitter over the
    same ``order_col``-ordered row numbering, plus the lsn=1 Relation
    frame. Returns a DataFrame in FRAMES_SCHEMA."""
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pypgoutput_spark.wal import codec
    from pypgoutput_spark.wal.generator import FRAMES_SCHEMA

    n = n_rows
    q = (n + n_segments - 1) // n_segments
    seg_span = 4 * q + 2
    # global row number by the (unique) order column. The single-task
    # window sort is bounded by the SOURCE row count, not frame count,
    # and everything downstream is parallel again.
    df = rows_df.withColumn(
        "rn", F.row_number().over(Window.orderBy(order_col)) - 1
    )

    def enc(batches):
        for pdf in batches:
            out = []
            rns = pdf["rn"].tolist()
            for i, row in enumerate(pdf.drop(columns=["rn"]).itertuples(index=False)):
                out.extend(_row_frames(
                    row, int(rns[i]), n, q, seg_span, rel_id,
                    insert_cells, upd_cells, del_cells,
                    upd_draw, del_draw, upd_pct, del_pct, xid_base,
                ))
            if out:
                yield pd.DataFrame(out)

    n_enc = max(16, spark.sparkContext.defaultParallelism)
    frames = df.repartition(n_enc, "rn").mapInPandas(enc, schema=FRAMES_SCHEMA)
    rel = codec.encode_relation(rel_id, "public", rel_name, "d", rel_cols)
    rel_df = spark.createDataFrame(
        [(0, 1, "R", bytearray(rel))], schema=FRAMES_SCHEMA
    )
    return frames.unionByName(rel_df)


def frames_clustered_safe(path: str, limit_bytes: int = 100 << 20) -> bool:
    """True when a materialized frame directory may be decoded with
    ``clustered=True``: every parquet file under ``limit_bytes`` (safely
    below the default ``spark.sql.files.maxPartitionBytes`` of 128 MB),
    so the scan packs whole files into partitions and never SPLITS one —
    the segment-per-partition contract the clustered decode relies on.
    A file over the limit (a larger scale factor) falls back to the
    repartition-by-segment decode: one more exchange, always correct."""
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                try:
                    if os.path.getsize(os.path.join(root, f)) > limit_bytes:
                        return False
                except OSError:
                    return False
    return True


def _materialize_frames(spark, frames_pdf, path: str):
    """Driver-encoded frames (pandas) → one parquet pass, repartitioned
    so each WAL segment lands wholly in one file: every ingest scan then
    reads column-pruned parquet instead of re-shipping the driver-local
    relation per job, and the decode runs clustered (zero
    repartition-by-segment exchange per micro-batch) whenever
    :func:`frames_clustered_safe` holds for the written files."""
    from pyspark.sql import functions as F

    from pypgoutput_spark.wal.generator import FRAMES_SCHEMA

    df = (
        frames_pdf if hasattr(frames_pdf, "sparkSession")
        else spark.createDataFrame(frames_pdf, schema=FRAMES_SCHEMA)
    )
    (
        df.repartition(F.col("segment"))
        .sortWithinPartitions("segment", "lsn")
        .write.parquet(path)
    )
    return spark.read.parquet(path)


def encode_documents_frames(sf_dir: str):
    """Deterministic WAL frames (pandas) for the documents stream: one
    Relation message, then per segment one transaction containing the
    segment's inserts / revisions / deletions in doc_id order."""
    import duckdb

    docs = (
        duckdb.connect()
        .execute(
            "SELECT doc_id, text, lang, source, n_chars FROM "
            f"read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
        )
        .df()
    )

    def cells(doc_id, text, lang, source):
        n_chars = None if text is None else len(text)
        return [_cell(doc_id), _cell(text), _cell(lang),
                _cell(source), _cell(n_chars)]

    def upd_cells(row):
        # NULL || suffix is NULL in SQL — mirror it (oracle parity)
        rev = None if row.text is None else row.text + REV_SUFFIX
        return cells(row.doc_id, rev, row.lang, row.source)

    return _encode_stream(
        docs, REL_ID, "documents",
        [(1, "doc_id", 20, -1), (0, "text", 25, -1), (0, "lang", 25, -1),
         (0, "source", 25, -1), (0, "n_chars", 20, -1)],
        insert_cells=lambda r: cells(r.doc_id, r.text, r.lang, r.source),
        upd_cells=upd_cells,
        del_cells=lambda r: [_cell(r.doc_id)] + [("n", None)] * 4,
        upd_draw=lambda r: _draw("docu", r.doc_id),
        del_draw=lambda r: _draw("docd", r.doc_id),
        upd_pct=UPD_PCT, del_pct=DEL_PCT,
        n_segments=N_SEGMENTS, xid_base=9000,
    )


def q_documents_corpus(spark, sf_dir: str):
    from pypgoutput_spark.lake.table import LakeTable
    from pypgoutput_spark.streaming import pipeline as _pipeline
    from pypgoutput_spark.wal.generator import FRAMES_SCHEMA

    tmp = tempfile.mkdtemp(prefix="pypgoutput_spark_docs_")
    frames = _materialize_frames(
        spark, encode_documents_frames(sf_dir), f"{tmp}/frames"
    )
    table = LakeTable.create(
        spark, f"{tmp}/lake",
        schema=[(c, "string") for c in COLUMNS],
        key_cols=["doc_id"], n_buckets=8,
    )
    _pipeline.run_ingest(spark, frames, table, relation_id=REL_ID, n_batches=4,
                         clustered=frames_clustered_safe(f"{tmp}/frames"))
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


# ---- CDC-maintained ANN index (embeddings relation) -------------------------

#: relation identity for the synthetic embeddings stream
EMB_REL_ID = 7002
#: embeddings stream draws: revised (vector negated), deleted
EMB_UPD_PCT, EMB_DEL_PCT = 25, 10
EMB_SEGMENTS = 4
#: IVF cells for the index assignment over the mirrored corpus
EMB_CENTROIDS = 16


def _emb_quant_csv_duck() -> str:
    """The quantization (similarity._quant, DuckDB dialect) rendered to a
    CSV string — evaluated ONCE in DuckDB at encode time, so the wire
    carries exactly the integers the oracle's own quantization produces
    (no cross-engine float round-trip anywhere)."""
    return (
        "array_to_string(list_transform(embedding, "
        "x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)), ',')"
    )


def encode_embeddings_frames(sf_dir: str):
    """Deterministic WAL frames for the embeddings stream: insert every
    vector (as a quantized-integer CSV cell), negate a drawn 25%
    (an embedding-refresh upsert), delete a drawn 10%."""
    import duckdb

    vecs = (
        duckdb.connect()
        .execute(
            # label cast to VARCHAR in-query: pandas would otherwise
            # widen a nullable INTEGER column to float64 and a label of
            # 3 would ride the wire as '3.0'
            f"SELECT vec_id, {_emb_quant_csv_duck()} AS qcsv, "
            "CAST(label AS VARCHAR) AS label FROM "
            f"read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
        )
        .df()
    )

    def _neg(csv: str) -> str:
        return ",".join(str(-int(v)) for v in csv.split(","))

    return _encode_stream(
        vecs, EMB_REL_ID, "embeddings",
        [(1, "vec_id", 20, -1), (0, "qcsv", 25, -1), (0, "label", 23, -1)],
        insert_cells=lambda r: [_cell(r.vec_id), _cell(r.qcsv), _cell(r.label)],
        upd_cells=lambda r: [_cell(r.vec_id), _cell(_neg(r.qcsv)), _cell(r.label)],
        del_cells=lambda r: [_cell(r.vec_id), ("n", None), ("n", None)],
        upd_draw=lambda r: _draw("embu", r.vec_id),
        del_draw=lambda r: _draw("embd", r.vec_id),
        upd_pct=EMB_UPD_PCT, del_pct=EMB_DEL_PCT,
        n_segments=EMB_SEGMENTS, xid_base=9100,
    )


def _emb_parse(d: Dialect, col: str = "qcsv") -> str:
    """CSV of quantized ints → ARRAY<BIGINT>. Spark-side only: the
    oracle never round-trips CSV (it quantizes the parquet arrays
    directly), so there is deliberately no DuckDB branch to rot."""
    assert d.name == "spark", "CSV parse is the mirror-read path only"
    return d.array_transform(f"split({col}, ',')", "x -> CAST(x AS BIGINT)")


def _emb_assign_sql(d: Dialect, src: str, en_tbl: str = "") -> str:
    """IVF cell assignment over ``src(vec_id BIGINT, qv ARRAY<BIGINT>)``
    — the index-build step of sim_ivf_cells (deterministic md5 seeding,
    broadcast-sized centroid table, tie → smallest c_id), run over the
    CDC-RESOLVED corpus: the index always reflects the mirror.

    ``en_tbl``: a pre-materialized (vec_id, qv, nrm) view name — the
    Spark runner's form: Catalyst inlines WITH-CTEs, so the inline
    ``en`` re-runs the mirror's merge-on-read resolution + CSV parse
    once per reference (~4× through seed/s/b/asg). Empty renders the
    inline CTE — the oracle's form, and the default."""
    from pypgoutput_spark.operators.similarity import DIM

    na = d.dot_bigint("qv", "qv", DIM)
    en = en_tbl or "en"
    dot = d.dot_bigint(f"{en}.qv", "c.cv", DIM)
    prefix = ("" if en_tbl
              else f"en AS (SELECT vec_id, qv, {na} AS nrm FROM {src}),\n")
    return f"""
{prefix}seed AS (
  SELECT vec_id AS c_id, qv AS cv, nrm AS cnrm
  FROM {en} ORDER BY {d.md5_int(d.s('vec_id'))}, vec_id LIMIT {EMB_CENTROIDS}
),
s AS (
  SELECT {en}.vec_id, c.c_id,
    CAST({dot} AS DOUBLE) / sqrt(CAST(c.cnrm AS DOUBLE)) AS score
  FROM {en} CROSS JOIN seed c
),
b AS (SELECT vec_id, max(score) AS ms FROM s GROUP BY vec_id),
asg AS (
  SELECT s.vec_id, min(s.c_id) AS c_id
  FROM s JOIN b ON s.vec_id = b.vec_id AND s.score = b.ms
  GROUP BY s.vec_id
)
SELECT vec_id, c_id FROM asg
""".strip()


def q_embeddings_index(spark, sf_dir: str):
    """CDC-maintained ANN index: an embeddings-shaped relation (BIGINT
    key + quantized-vector CSV payload) rides the generic decode → LWW →
    merge-on-read path into a vec_id-keyed LakeTable; the resolved
    mirror then gets its IVF cell assignment — proving the index-build
    consumes CDC-fresh state (refreshed embeddings re-assign, deleted
    ones vanish). The oracle applies the draws straight to the
    embeddings table and assigns cells with the same deterministic
    SQL — no WAL byte seen."""
    from pypgoutput_spark.lake.table import LakeTable
    from pypgoutput_spark.streaming import pipeline as _pipeline
    from pypgoutput_spark.wal.generator import FRAMES_SCHEMA

    tmp = tempfile.mkdtemp(prefix="pypgoutput_spark_emb_")
    frames = _materialize_frames(
        spark, encode_embeddings_frames(sf_dir), f"{tmp}/frames"
    )
    table = LakeTable.create(
        spark, f"{tmp}/lake",
        schema=[("vec_id", "string"), ("qcsv", "string"), ("label", "string")],
        key_cols=["vec_id"], n_buckets=8,
    )
    _pipeline.run_ingest(spark, frames, table, relation_id=EMB_REL_ID,
                         n_batches=EMB_SEGMENTS,
                         clustered=frames_clustered_safe(f"{tmp}/frames"))
    d = SPARK
    table.read().createOrReplaceTempView("cdc_emb_final")
    # materialize the (vec_id, qv, nrm) projection ONCE: the inline-CTE
    # form re-ran the mirror's merge-on-read resolution + CSV parse per
    # ``en`` reference (~4× through seed/s/b/asg — the §9 staged-view
    # rule applied within one query)
    from pypgoutput_spark.operators.similarity import DIM

    na = d.dot_bigint("qv", "qv", DIM)
    en = spark.sql(f"""
WITH parsed AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id, {_emb_parse(d)} AS qv
  FROM cdc_emb_final
)
SELECT vec_id, qv, {na} AS nrm FROM parsed
""".strip()).localCheckpoint()
    en.createOrReplaceTempView("cdc_emb_en")
    return spark.sql("WITH " + _emb_assign_sql(d, "parsed",
                                               en_tbl="cdc_emb_en"))


def embeddings_index_oracle(d: Dialect = DUCKDB) -> str:
    upd = _sql_draw_col(d, "embu", "vec_id")
    dele = _sql_draw_col(d, "embd", "vec_id")
    quant = d.array_transform(
        "embedding", "x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)"
    )
    return f"""
WITH drawn AS (
  SELECT vec_id, {quant} AS qv0,
    ({upd} < {EMB_UPD_PCT}) AS upd, ({dele} < {EMB_DEL_PCT}) AS del
  FROM embeddings
),
final AS (
  SELECT vec_id,
    CASE WHEN upd THEN {d.array_transform('qv0', 'x -> -x')} ELSE qv0 END AS qv
  FROM drawn WHERE NOT del
),
{_emb_assign_sql(d, 'final')}
""".strip()


QUERIES = {
    "cdc_documents_corpus": (q_documents_corpus, documents_corpus_oracle()),
    "cdc_embeddings_index": (q_embeddings_index, embeddings_index_oracle()),
}
