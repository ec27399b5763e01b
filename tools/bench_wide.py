#!/usr/bin/env python
"""Wide-relation decode throughput (multi-word TOAST u-mask path).

Round 3 replaced the single-BIGINT u-mask with ARRAY<BIGINT> words to
lift the 64-column cap (PostgreSQL allows 1600). This probes what that
costs: decode a 100-column relation stream and a standard 8-column
generator stream of comparable total cell volume, and report cells/s
for both. The mask-word loop is O(width/64) per message in the
vectorized kernel, so wide relations should decode at a similar
per-cell rate, not a similar per-frame rate.

    SPARK_GRAFT_CPUS=8 python tools/bench_wide.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _mk_spark  # noqa: E402

N_COLS = 100
N_TXNS = 5_000
OPS_PER_TXN = 8
N_SEGMENTS = 16


def _wide_frames(spark):
    from pypgoutput_spark.wal import codec
    from pypgoutput_spark.wal.generator import FRAMES_SCHEMA

    rid = 4242
    cols = [("k", 1)] + [(f"c{i}", 0) for i in range(N_COLS - 1)]
    rel_columns = tuple((pk, name, 25, -1) for name, pk in cols)

    def cells(key: str, fill: int):
        out = [("t", key)]
        for i in range(N_COLS - 1):
            # every 10th cell TOAST-unchanged → exercises the mask words
            out.append(("u", None) if (i + fill) % 10 == 0 else ("t", f"v{fill}-{i}"))
        return out

    rows = [(0, 1, "R", bytearray(codec.encode_relation(rid, "p", "wide", "d", rel_columns)))]
    lsn = 10
    txns_per_seg = (N_TXNS + N_SEGMENTS - 1) // N_SEGMENTS
    for t in range(N_TXNS):
        seg = t // txns_per_seg
        rows.append((seg, lsn, "B", bytearray(codec.encode_begin(t + 1, 0, lsn))))
        lsn += 1
        for o in range(OPS_PER_TXN):
            key = f"k{(t * OPS_PER_TXN + o) % 20_000}"
            mtype = "I" if o % 3 else "U"
            enc = codec.encode_insert if mtype == "I" else codec.encode_update
            rows.append((seg, lsn, mtype, bytearray(enc(rid, cells(key, t)))))
            lsn += 1
        rows.append((seg, lsn, "C", bytearray(codec.encode_commit(lsn - 1, lsn, 0))))
        lsn += 1
    return spark.createDataFrame(rows, schema=FRAMES_SCHEMA)


def _decode_wall(spark, frames_dir: str) -> float:
    from pypgoutput_spark.operators import decode as decode_op

    frames = spark.read.parquet(frames_dir)
    t0 = time.monotonic()
    raw = decode_op.decode_frames_raw(frames, clustered=True)
    raw.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> None:
    from pypgoutput_spark.wal import generator as gen

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = _mk_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="bench_wide_")
    try:
        wide_dir = os.path.join(tmp, "wide")
        _wide_frames(spark).repartition(N_SEGMENTS, "segment").write.parquet(wide_dir)
        n_wide_events = N_TXNS * OPS_PER_TXN

        # narrow stream with ~the same total cell count
        n_cols_narrow = len(gen.ALL_COLUMNS)
        narrow_events = n_wide_events * N_COLS // n_cols_narrow
        p = gen.GenParams(
            n_txns=narrow_events // 8, ops_per_txn=8,
            n_repos=2_000, toast_pct=10,
            txns_per_segment=max(10, narrow_events // 8 // N_SEGMENTS),
        )
        narrow_dir = os.path.join(tmp, "narrow")
        gen.spark_frames_df(spark, p, n_partitions=N_SEGMENTS).write.parquet(narrow_dir)

        _decode_wall(spark, narrow_dir)  # warm-up: workers + codegen
        walls = {
            "wide": min(_decode_wall(spark, wide_dir) for _ in range(2)),
            "narrow": min(_decode_wall(spark, narrow_dir) for _ in range(2)),
        }
        wide_cells = n_wide_events * N_COLS
        narrow_cells = p.n_ops * n_cols_narrow
        print(json.dumps({
            "cpus": cpus,
            "wide_cols": N_COLS,
            "wide_events": n_wide_events,
            "wide_wall_sec": round(walls["wide"], 2),
            "wide_cells_per_sec": round(wide_cells / walls["wide"], 1),
            "narrow_cols": n_cols_narrow,
            "narrow_events": p.n_ops,
            "narrow_wall_sec": round(walls["narrow"], 2),
            "narrow_cells_per_sec": round(narrow_cells / walls["narrow"], 1),
            "wide_over_narrow_cell_rate": round(
                (wide_cells / walls["wide"]) / (narrow_cells / walls["narrow"]), 3
            ),
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
