"""Unbounded(-ish) WAL producer process: spools the deterministic
generator stream chunk by chunk (no JVM — DuckDB + the pandas encoder),
sleeping between chunks so receiver and Spark stream genuinely run
concurrently. The walsender analog for the receiver seam
(pypgoutput_spark.sources.receiver; reference reader.py:334-390).

Usage:
  python tools/live_source.py --spool DIR --n-txns 60 --ops-per-txn 6 \
      --txns-per-segment 5 --chunk-txns 10 --sleep-ms 50
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    sys.path.insert(0, ".")
    from pypgoutput_spark.sources.receiver import SpoolWriter, encode_frames_pdf
    from pypgoutput_spark.wal.generator import GenParams

    ap = argparse.ArgumentParser()
    ap.add_argument("--spool", required=True)
    ap.add_argument("--n-txns", type=int, default=60)
    ap.add_argument("--ops-per-txn", type=int, default=6)
    ap.add_argument("--txns-per-segment", type=int, default=5)
    ap.add_argument("--toast-pct", type=int, default=25)
    ap.add_argument("--key-change-pct", type=int, default=0)
    ap.add_argument("--truncate-every", type=int, default=0)
    ap.add_argument("--stream-pct", type=int, default=0)
    ap.add_argument("--stream-abort-pct", type=int, default=0)
    ap.add_argument("--interleave-streams", action="store_true")
    ap.add_argument("--chunk-txns", type=int, default=10)
    ap.add_argument("--sleep-ms", type=int, default=20)
    args = ap.parse_args(argv)

    if args.interleave_streams and args.chunk_txns % 2:
        raise SystemExit("--interleave-streams requires even --chunk-txns "
                         "(a chunk pair's halves must share a spool chunk)")
    p = GenParams(
        n_txns=args.n_txns, ops_per_txn=args.ops_per_txn,
        txns_per_segment=args.txns_per_segment, toast_pct=args.toast_pct,
        key_change_pct=args.key_change_pct, truncate_every=args.truncate_every,
        stream_pct=args.stream_pct, stream_abort_pct=args.stream_abort_pct,
        interleave_streams=args.interleave_streams,
    )
    w = SpoolWriter(args.spool)
    lo = 0
    first = True
    while lo < p.n_txns:
        hi = min(lo + args.chunk_txns, p.n_txns)
        frames = encode_frames_pdf(p, lo, hi, include_relation=first)
        w.write_chunk(frames)
        first = False
        lo = hi
        time.sleep(args.sleep_ms / 1000.0)
    w.finish()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
