"""Transactional-outbox messages over the CDC stream (pgoutput 'M').

``pg_logical_emit_message`` is how the transactional-outbox pattern
rides logical replication: an application emits a message inside the
transaction that performs the write, and the decoder delivers it
exactly when (and only if) that transaction commits — aborted
transactions' messages never existed. Non-transactional messages are
delivered immediately with no transaction attached, even when they
appear between a Begin and a Commit.

The reference decoder predates 'M' support (reference
src/pypgoutput/decoders.py handles B/C/O/R/Y/I/U/D/T only), so this is
parity-plus, like the protocol-v2 stream grammar the engine also
decodes. Spark-first shape: messages surface as op='M' rows of the RAW
decode output (prefix/content in ``new_vals``, the transactional flag
in ``before_kind``), so the one decode pass serves both the table
mirror and the outbox consumer — no second scan of the WAL.

Fixture: a deterministic WAL derived from the sf_dir's documents table
— one transaction per document (insert + draw-gated transactional
message), a draw splitting transactions into plain / streamed-committed
/ streamed-aborted (in-chunk messages must follow their chunk's fate),
and draw-gated non-transactional audit messages between transactions.
The DuckDB oracle replays the same md5 draws and the closed-form LSN
layout without seeing a WAL byte.
"""

from __future__ import annotations

from pypgoutput_spark.functions.detsql import DUCKDB, Dialect
from pypgoutput_spark.operators.corpus_cdc import _draw, _sql_draw_col

#: relation identity for the synthetic outbox-business-table stream
REL_ID = 7003
#: draw bands over ``outa``: <ABORT_PCT streamed+aborted; <STREAM_PCT
#: streamed+committed; else plain transaction
ABORT_PCT, STREAM_PCT = 15, 30
#: draw: transaction carries a transactional outbox message
MSG_PCT = 60
#: draw: a non-transactional audit message follows the transaction
AUDIT_PCT = 10
N_SEGMENTS = 4
#: LSN slots per row: B/S, I, M?, E, C/A, audit-M?, 2 spare
SLOT_W = 8
XID_BASE = 9200


def encode_outbox_frames(sf_dir: str):
    """Deterministic WAL frames (pandas) for the outbox stream."""
    import duckdb
    import pandas as pd

    from pypgoutput_spark.wal import codec

    docs = (
        duckdb.connect()
        .execute(
            "SELECT doc_id, lang FROM "
            f"read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
        )
        .df()
    )
    n = len(docs)
    q = (n + N_SEGMENTS - 1) // N_SEGMENTS
    seg_span = SLOT_W * q + 2
    rel = codec.encode_relation(
        REL_ID, "public", "outbox_orders", "d",
        [(1, "doc_id", 20, -1), (0, "lang", 25, -1)],
    )
    out = [{"segment": 0, "lsn": 1, "mtype": "R", "payload": rel}]
    for r, row in enumerate(docs.itertuples(index=False)):
        seg, r0 = r // q, r % q
        base = 10 + seg_span * seg + SLOT_W * r0
        xid = XID_BASE + r
        outa = _draw("outa", row.doc_id)
        aborted = outa < ABORT_PCT
        streamed = outa < STREAM_PCT
        has_msg = _draw("outm", row.doc_id) < MSG_PCT
        ins = codec.encode_insert(
            REL_ID, [("t", str(row.doc_id)), ("t", str(row.lang))]
        )
        msg = codec.encode_logical_message(
            True, base + 2, "outbox",
            f'{{"doc":{row.doc_id},"op":"upsert"}}'.encode(),
        )
        if streamed:
            out.append({"segment": seg, "lsn": base, "mtype": "S",
                        "payload": codec.encode_stream_start(xid, True)})
            out.append({"segment": seg, "lsn": base + 1, "mtype": "i",
                        "payload": codec.add_stream_xid(ins, xid)})
            if has_msg:
                out.append({"segment": seg, "lsn": base + 2, "mtype": "m",
                            "payload": codec.add_stream_xid(msg, xid)})
            out.append({"segment": seg, "lsn": base + 3, "mtype": "E",
                        "payload": codec.encode_stream_stop()})
            if aborted:
                out.append({"segment": seg, "lsn": base + 4, "mtype": "A",
                            "payload": codec.encode_stream_abort(xid)})
            else:
                out.append({
                    "segment": seg, "lsn": base + 4, "mtype": "c",
                    "payload": codec.encode_stream_commit(
                        xid, base + 3, base + 4, 2000 + r
                    ),
                })
        else:
            out.append({"segment": seg, "lsn": base, "mtype": "B",
                        "payload": codec.encode_begin(base, 1000 + r, xid)})
            out.append({"segment": seg, "lsn": base + 1, "mtype": "I",
                        "payload": ins})
            if has_msg:
                out.append({"segment": seg, "lsn": base + 2, "mtype": "M",
                            "payload": msg})
            out.append({"segment": seg, "lsn": base + 4, "mtype": "C",
                        "payload": codec.encode_commit(
                            base + 3, base + 4, 1000 + r)})
        if _draw("outn", row.doc_id) < AUDIT_PCT:
            out.append({
                "segment": seg, "lsn": base + 5, "mtype": "M",
                "payload": codec.encode_logical_message(
                    False, base + 5, "audit",
                    f'{{"doc":{row.doc_id},"kind":"audit"}}'.encode(),
                ),
            })
    return pd.DataFrame(out)


def q_outbox_messages(spark, sf_dir: str):
    """Decode the outbox stream (strict vectorized path — the in-chunk
    messages ride the v2 stream resolver) and surface the delivered
    messages: committed transactional ones with their transaction
    stamps, non-transactional ones unstamped, aborted ones absent."""
    from pypgoutput_spark.operators import decode as decode_op
    from pypgoutput_spark.wal.generator import FRAMES_SCHEMA

    frames = spark.createDataFrame(
        encode_outbox_frames(sf_dir), schema=FRAMES_SCHEMA
    )
    raw = decode_op.decode_frames_raw(frames)
    raw.filter("op = 'M'").createOrReplaceTempView("outbox_raw_v")
    return spark.sql("""
SELECT lsn, xid, commit_ts_us,
  (before_kind = 't') AS transactional,
  new_vals[0] AS prefix, new_vals[1] AS content
FROM outbox_raw_v
""".strip())


def outbox_messages_oracle(d: Dialect = DUCKDB) -> str:
    """No WAL: the same draws + closed-form LSN layout in SQL."""
    outa = _sql_draw_col(d, "outa", "doc_id")
    outm = _sql_draw_col(d, "outm", "doc_id")
    outn = _sql_draw_col(d, "outn", "doc_id")
    return f"""
WITH ord AS (
  SELECT doc_id,
    CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS r,
    CAST(count(*) OVER () AS BIGINT) AS n
  FROM documents
),
pos AS (
  SELECT doc_id, r,
    10 + ({SLOT_W} * {d.idiv('(n + 3)', '4')} + 2)
       * {d.idiv('r', d.idiv('(n + 3)', '4'))}
       + {SLOT_W} * (r % {d.idiv('(n + 3)', '4')}) AS base,
    {outa} AS outa, {outm} AS outm, {outn} AS outn
  FROM ord
),
txn_msgs AS (
  SELECT base + 2 AS lsn, {XID_BASE} + r AS xid,
    CASE WHEN outa < {STREAM_PCT} THEN 2000 + r ELSE 1000 + r END
      AS commit_ts_us,
    TRUE AS transactional, 'outbox' AS prefix,
    concat('{{"doc":', CAST(doc_id AS VARCHAR), ',"op":"upsert"}}')
      AS content
  FROM pos
  WHERE outm < {MSG_PCT} AND outa >= {ABORT_PCT}
),
audit_msgs AS (
  SELECT base + 5 AS lsn, CAST(NULL AS BIGINT) AS xid,
    CAST(NULL AS BIGINT) AS commit_ts_us,
    FALSE AS transactional, 'audit' AS prefix,
    concat('{{"doc":', CAST(doc_id AS VARCHAR), ',"kind":"audit"}}')
      AS content
  FROM pos
  WHERE outn < {AUDIT_PCT}
)
SELECT * FROM txn_msgs UNION ALL SELECT * FROM audit_msgs
""".strip()


def q_outbox_sink(spark, sf_dir: str):
    """Full-pipeline outbox delivery: the same stream ingested with
    ``run_ingest(messages_dir=...)`` — table merge AND message delivery
    out of ONE decode pass — then consumed with
    :func:`pipeline.read_messages` (LSN-deduped, effectively-once).
    Must equal the decode-level message set, so it shares the WAL-free
    oracle."""
    import tempfile

    from pypgoutput_spark.lake.table import LakeTable
    from pypgoutput_spark.streaming import pipeline as _pipeline
    from pypgoutput_spark.wal.generator import FRAMES_SCHEMA

    frames = spark.createDataFrame(
        encode_outbox_frames(sf_dir), schema=FRAMES_SCHEMA
    )
    tmp = tempfile.mkdtemp(prefix="pypgoutput_spark_outbox_")
    table = LakeTable.create(
        spark, f"{tmp}/lake",
        schema=[("doc_id", "string"), ("lang", "string")],
        key_cols=["doc_id"], n_buckets=8,
    )
    _pipeline.run_ingest(
        spark, frames, table, relation_id=REL_ID, n_batches=N_SEGMENTS,
        messages_dir=f"{tmp}/messages",
    )
    return _pipeline.read_messages(spark, f"{tmp}/messages").select(
        "lsn", "xid", "commit_ts_us", "transactional", "prefix", "content"
    )


QUERIES = {
    "cdc_outbox_messages": (q_outbox_messages, outbox_messages_oracle()),
    "cdc_outbox_sink": (q_outbox_sink, outbox_messages_oracle()),
}
