#!/usr/bin/env python
"""Host-capability probes bounding what ANY workload can show on this box.

Run back-to-back with `bench.py --scaling` so every campaign in
BENCH/BASELINE.md carries the ceilings of the window it was measured in
(this virtualized host's memory subsystem varies 2-4x run-to-run):

  * random-gather memory bandwidth (numpy fancy-index, 50 MB working
    set per process) — the decode/shuffle access pattern; and
  * a cache-resident integer loop — pure-CPU scaling.

Each probe runs process-parallel at N and 4N (default 2,8), best-of-3
interleaved, and reports aggregate throughput at both plus
efficiency = (thr_4N / thr_N) / 4.

    SPARK_GRAFT_PROBE_CPUS=2,8 python tools/host_probes.py
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time


def _gather_worker(q) -> None:
    import numpy as np

    data = np.random.default_rng(0).integers(0, 2**31, size=50_000_000 // 8, dtype=np.int64)
    idx = np.random.default_rng(1).integers(0, data.size, size=data.size, dtype=np.int64)
    t0 = time.monotonic()
    s = 0
    for _ in range(8):
        s += int(data[idx].sum())
    q.put(time.monotonic() - t0)


def _cpu_worker(q) -> None:
    t0 = time.monotonic()
    s = 0
    for i in range(30_000_000):
        s += i ^ (s & 0xFFFF)
    q.put(time.monotonic() - t0)


def _run(worker, n: int) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(q,)) for _ in range(n)]
    for p in ps:
        p.start()
    walls = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return max(walls)  # slowest process bounds the aggregate


def probe(worker, unit_work: float, lo: int, hi: int, trials: int = 3) -> dict:
    best: dict = {}
    for _ in range(trials):
        for n in (lo, hi):  # interleaved
            thr = n * unit_work / _run(worker, n)
            best[n] = max(best.get(n, 0.0), thr)
    return {
        f"agg_throughput_{lo}": round(best[lo], 1),
        f"agg_throughput_{hi}": round(best[hi], 1),
        f"efficiency_{lo}_to_{hi}": round((best[hi] / best[lo]) / (hi / lo), 3),
    }


def main() -> None:
    lo, hi = (int(x) for x in os.environ.get("SPARK_GRAFT_PROBE_CPUS", "2,8").split(","))
    out = {
        "gather_bytes_per_sec": probe(_gather_worker, 8 * 50_000_000, lo, hi),
        "cpu_ops_per_sec": probe(_cpu_worker, 30_000_000, lo, hi),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
