"""Binary-mode CDC end to end: a TYPED relation replicated with
``binary = on`` (PG14+) resolves to the same typed table text mode would.

Every other CDC entry rides text-mode TupleData; this one proves the
binary-cell conversion (wal.codec.binary_cell / wal.vdecode._bin_convert)
end to end across the full type surface — bigint/int/smallint keys and
values, boolean, float4/float8, numeric(18,4), timestamp, date, uuid,
text, jsonb — through the identical decode → LWW → merge-on-read path:
a deterministic WAL stream derived from the sf_dir's ``orders`` table
(insert every order, revise a drawn 25%, delete a drawn 10%) is encoded
with EVERY value cell in the type's binary send format, ingested into a
LakeTable keyed on the order key, and the final state is read back as
typed columns.

The DuckDB oracle never sees a WAL byte OR a text spelling of the binary
columns: it applies the same md5 draws directly to ``orders`` and
computes the typed values natively — so a hash match proves the binary
wire bits decode to exactly the values the source held (floats compare
as the same IEEE doubles; the numeric(18,4) column compares through an
exact-in-double value, integer + 0.25, because the two engines spell
equal decimals at different scales; timestamps through the same
strftime rendering).

The revision update also sends the jsonb column as TOAST-unchanged
('u'), pinning that TOAST preservation composes with binary mode.

Reference scope: the reference pins text mode (reference
decoders.py:96-128 handles only n/u/t) — binary-mode decode is a
capability extension; scale rationale: binary cells skip the server's
type-output and the engine's text re-parse for fixed-width types, the
cheaper wire format for numeric-heavy relations at 100 TB.
"""

from __future__ import annotations

import hashlib
import tempfile

from pypgoutput_spark.functions.detsql import DUCKDB, SPARK, Dialect
from pypgoutput_spark.operators.corpus_cdc import _encode_stream, _sql_draw_col

#: relation identity for the synthetic typed binary stream
REL_ID = 7003
#: md5 draw percentages: revised orders, deleted orders (independent draws)
UPD_PCT, DEL_PCT = 25, 10
N_SEGMENTS = 4

#: (part_of_pkey, name, type_oid, atttypmod) — numeric typmod encodes (18,4)
REL_COLS = [
    (1, "id", 20, -1),           # bigint (o_orderkey)
    (0, "cust", 23, -1),         # int4   (o_custkey)
    (0, "flag", 16, -1),         # bool   (o_orderkey even)
    (0, "price", 701, -1),       # float8 (o_totalprice; doubled by update)
    (0, "ratio", 700, -1),       # float4 ((o_orderkey % 1000) / 8 — dyadic, exact)
    (0, "amount", 1700, ((18 << 16) | 4) + 4),  # numeric(18,4) (o_orderkey + 0.25)
    (0, "ots", 1114, -1),        # timestamp (o_orderdate)
    (0, "odate", 1082, -1),      # date
    (0, "uid", 2950, -1),        # uuid (md5-derived)
    (0, "status", 25, -1),       # text (o_orderstatus; '+'-suffixed by update)
    (0, "pr", 3802, -1),         # jsonb ({"p": "<o_orderpriority>"}; TOAST-'u' in update)
    (0, "sm", 21, -1),           # int2   (o_orderkey % 100 - 50)
]
COLUMNS = [c[1] for c in REL_COLS]
OIDS = [c[2] for c in REL_COLS]


def _draw(tag: str, key) -> int:
    h = hashlib.md5(f"{tag}:{key}".encode()).hexdigest()[:15]
    return int(h, 16) % 100


def _uuid_of(key) -> str:
    h = hashlib.md5(str(key).encode()).hexdigest()
    return f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"


def encode_binary_frames(sf_dir: str):
    """Deterministic WAL frames (pandas) with every value cell in binary
    send format. Float bits are exact: the cells pack the parquet doubles
    themselves (``repr`` round-trips), never a rounded text rendering."""
    import duckdb

    orders = (
        duckdb.connect()
        .execute(
            "SELECT o_orderkey AS k, o_custkey AS c, o_orderstatus AS s, "
            "CAST(o_totalprice AS DOUBLE) AS p, o_orderdate AS ts, "
            "o_orderpriority AS prio FROM "
            f"read_parquet('{sf_dir}/orders.parquet') ORDER BY o_orderkey"
        )
        .df()
    )
    # doubled price, flipped flag, '+'-suffixed status in upd; jsonb rides
    # as TOAST-unchanged — resolution must preserve the insert's value
    ins, upd, dele = _order_cell_fns()
    return _encode_stream(
        orders, REL_ID, "order_metrics", REL_COLS,
        insert_cells=ins, upd_cells=upd, del_cells=dele,
        upd_draw=lambda r: _draw("obu", int(r.k)),
        del_draw=lambda r: _draw("obd", int(r.k)),
        upd_pct=UPD_PCT, del_pct=DEL_PCT,
        n_segments=N_SEGMENTS, xid_base=9300,
    )


def _order_cell_fns():
    """The per-row cell builders shared by the driver-side and
    distributed encoders (row fields: k, c, s, p, ts, prio)."""
    from pypgoutput_spark.wal import codec

    def cells(r, price: float, flag_t: bool, status: str, pr_cell):
        k = int(r.k)
        return [
            codec.binary_cell(20, str(k)),
            codec.binary_cell(23, str(int(r.c))),
            codec.binary_cell(16, "t" if flag_t else "f"),
            codec.binary_cell(701, repr(float(price))),
            codec.binary_cell(700, repr((k % 1000) / 8.0)),
            codec.binary_cell(1700, f"{k}.2500"),
            codec.binary_cell(1114, str(r.ts)),
            codec.binary_cell(1082, str(r.ts.date())),
            codec.binary_cell(2950, _uuid_of(k)),
            codec.binary_cell(25, status),
            pr_cell,
        ] + [codec.binary_cell(21, str(k % 100 - 50))]

    def ins(r):
        pr = codec.binary_cell(3802, '{"p": "' + r.prio + '"}')
        return cells(r, r.p, int(r.k) % 2 == 0, r.s, pr)

    def upd(r):
        return cells(r, r.p * 2, int(r.k) % 2 != 0, r.s + "+", ("u", None))

    def dele(r):
        return [codec.binary_cell(20, str(int(r.k)))] + [("n", None)] * 11

    return ins, upd, dele


def encode_binary_frames_spark(spark, sf_dir: str):
    """Distributed twin of :func:`encode_binary_frames` (byte-identical
    frames): ~200k orders × 12 binary cells is millions of driver-side
    Python struct-packs — ~19 s serial at sf0.1 — so the per-row encode
    runs on executors via the shared row emitter instead (guide §4.2:
    let Spark distribute; hand each task its row slice). Only the row
    COUNT is read driver-side (parquet footer metadata, no Spark job)."""
    import duckdb

    from pypgoutput_spark.operators.corpus_cdc import _encode_stream_spark

    n_rows = duckdb.connect().execute(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/orders.parquet')"
    ).fetchone()[0]
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").selectExpr(
        "o_orderkey AS k", "o_custkey AS c", "o_orderstatus AS s",
        "CAST(o_totalprice AS DOUBLE) AS p", "o_orderdate AS ts",
        "o_orderpriority AS prio",
    )
    ins, upd, dele = _order_cell_fns()
    return _encode_stream_spark(
        spark, orders, int(n_rows), "k",
        REL_ID, "order_metrics", REL_COLS,
        insert_cells=ins, upd_cells=upd, del_cells=dele,
        upd_draw=lambda r: _draw("obu", int(r.k)),
        del_draw=lambda r: _draw("obd", int(r.k)),
        upd_pct=UPD_PCT, del_pct=DEL_PCT,
        n_segments=N_SEGMENTS, xid_base=9300,
    )


def q_binary_typed_final_state(spark, sf_dir: str):
    from pypgoutput_spark.lake.table import LakeTable
    from pypgoutput_spark.streaming import pipeline as _pipeline
    from pypgoutput_spark.wal.generator import FRAMES_SCHEMA

    from pypgoutput_spark.operators.corpus_cdc import (
        _materialize_frames,
        frames_clustered_safe,
    )

    tmp = tempfile.mkdtemp(prefix="pypgoutput_spark_bin_")
    frames = _materialize_frames(
        spark, encode_binary_frames_spark(spark, sf_dir), f"{tmp}/frames"
    )
    table = LakeTable.create(
        spark, f"{tmp}/lake",
        schema=[(c, "string") for c in COLUMNS],
        key_cols=["id"], n_buckets=8,
    )
    _pipeline.run_ingest(spark, frames, table, relation_id=REL_ID,
                         n_batches=N_SEGMENTS,
                         clustered=frames_clustered_safe(f"{tmp}/frames"))
    table.read().createOrReplaceTempView("cdc_bin_final")
    return spark.sql("""
SELECT CAST(id AS BIGINT) AS id, CAST(cust AS INT) AS cust,
  CAST(CAST(flag AS BOOLEAN) AS INT) AS flag,
  CAST(price AS DOUBLE) AS price,
  CAST(CAST(ratio AS FLOAT) AS DOUBLE) AS ratio,
  CAST(amount AS DOUBLE) AS amount,
  date_format(CAST(ots AS TIMESTAMP), 'yyyy-MM-dd HH:mm:ss') AS ots,
  date_format(CAST(odate AS DATE), 'yyyy-MM-dd') AS odate,
  uid, status, pr, CAST(sm AS INT) AS sm
FROM cdc_bin_final
""".strip())


def binary_typed_oracle(d: Dialect = DUCKDB) -> str:
    """No WAL, no text spellings: the draws and typed values computed
    natively over ``orders``."""
    upd = _sql_draw_col(d, "obu", "o_orderkey")
    dele = _sql_draw_col(d, "obd", "o_orderkey")
    m = f"md5({d.s('o_orderkey')})"
    if d.name == "duckdb":
        ts_s = "strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')"
        dt_s = "strftime(o_orderdate, '%Y-%m-%d')"
    else:
        ts_s = "date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss')"
        dt_s = "date_format(o_orderdate, 'yyyy-MM-dd')"
    return f"""
WITH drawn AS (
  SELECT o_orderkey AS id, o_custkey, o_orderstatus, o_totalprice,
    o_orderdate, o_orderpriority, {m} AS h,
    ({upd} < {UPD_PCT}) AS upd, ({dele} < {DEL_PCT}) AS del
  FROM orders
)
SELECT id, CAST(o_custkey AS INT) AS cust,
  CAST(CASE WHEN upd THEN (id % 2 <> 0) ELSE (id % 2 = 0) END AS INT) AS flag,
  CASE WHEN upd THEN CAST(o_totalprice AS DOUBLE) * 2
       ELSE CAST(o_totalprice AS DOUBLE) END AS price,
  CAST((id % 1000) AS DOUBLE) / 8 AS ratio,
  CAST(id AS DOUBLE) + 0.25 AS amount,
  {ts_s} AS ots,
  {dt_s} AS odate,
  substr(h,1,8) || '-' || substr(h,9,4) || '-' || substr(h,13,4) || '-'
    || substr(h,17,4) || '-' || substr(h,21,12) AS uid,
  CASE WHEN upd THEN o_orderstatus || '+' ELSE o_orderstatus END AS status,
  '{{"p": "' || o_orderpriority || '"}}' AS pr,
  CAST(id % 100 - 50 AS INT) AS sm
FROM drawn WHERE NOT del
""".strip()


QUERIES = {
    "cdc_binary_typed_final_state": (q_binary_typed_final_state,
                                     binary_typed_oracle()),
}
