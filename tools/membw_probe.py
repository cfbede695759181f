"""Host memory-bandwidth scaling probe (evidence for BENCH/BASELINE.md).

N independent processes each stream-copy a 50 MB numpy buffer (pages
faulted in before timing) for 3 s; reports aggregate and per-process
GB/s at N = 1, 2, 4, 8, 16, 32. The per-process decay curve bounds how
much ANY memory-intensive job can scale across threads of this single
host: thread-ladder efficiency on one box conflates CPU scaling with a
FIXED memory system, whereas the north_rule's N -> 4N EXECUTORS on a
real cluster bring 4x memory systems with them.

Measured on this sandbox (2026-08-17, idle):

    1 procs: aggregate  23.9 GB/s, per-proc 23.9
    2 procs: aggregate  41.3 GB/s, per-proc 20.6
    4 procs: aggregate  68.4 GB/s, per-proc 17.1
    8 procs: aggregate 112.2 GB/s, per-proc 14.0
   16 procs: aggregate 174.0 GB/s, per-proc 10.9
   32 procs: aggregate 250.7 GB/s, per-proc  7.8

i.e. pure memcpy itself scales only 2.2x from 8 -> 32 procs
(efficiency 0.56 on a 4x thread ratio) — the bound any bandwidth-
dominated workload inherits on this box.
"""

from __future__ import annotations

import multiprocessing as mp
import time

import numpy as np

# THE severe-bandwidth-depression threshold shared by bench.py and
# tools/scaling_bench.py (one definition — r5 second review: two
# drifting copies would classify the same co-tenant window
# differently): a rep whose bracketing single-stream probe reads
# below this on either side ran under severe co-tenant memory
# pressure that kernel/steal counters cannot see. ~40% of this box's
# idle ~24 GB/s; clean windows across 48 bracketed ladder reps never
# read below 14.5, contended ones read 1.2-8.2.
MEMBW_MIN_GBPS = 10.0

_BUFS: list = []


def membw_gbps(sec: float = 0.25) -> float:
    """Single-stream memcpy bandwidth over a short window — the
    in-process rep-bracketing probe (buffers allocated once)."""
    if not _BUFS:
        a = np.ones(50_000_000 // 8, dtype=np.int64)  # 50 MB
        b = np.empty_like(a)
        np.copyto(b, a)                 # fault pages in
        _BUFS.extend((a, b))
    a, b = _BUFS
    n = 0
    t0 = time.monotonic()
    while time.monotonic() - t0 < sec:
        np.copyto(b, a)
        n += 1
    # 0.05 GB read + 0.05 GB written per copy
    return n * 0.1 / (time.monotonic() - t0)


def worker(q, sec: float = 3.0) -> None:
    a = np.ones(50_000_000 // 8, dtype=np.int64)  # 50 MB
    b = np.empty_like(a)
    np.copyto(b, a)
    np.copyto(b, a)  # fault pages in before timing
    n = 0
    t0 = time.monotonic()
    while time.monotonic() - t0 < sec:
        np.copyto(b, a)
        n += 1
    dt = time.monotonic() - t0
    q.put(n * 0.1 / dt)  # 0.05 GB read + 0.05 GB written per copy


def main() -> None:
    for nproc in (1, 2, 4, 8, 16, 32):
        q: mp.Queue = mp.Queue()
        ps = [mp.Process(target=worker, args=(q,)) for _ in range(nproc)]
        for p in ps:
            p.start()
        vals = [q.get() for _ in ps]
        for p in ps:
            p.join()
        print(f"{nproc:2d} procs: aggregate {sum(vals):6.1f} GB/s, "
              f"per-proc {sum(vals) / nproc:5.2f} GB/s")


if __name__ == "__main__":
    main()
