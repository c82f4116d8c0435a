"""Memory-bandwidth capacity probe (no Ray): N worker processes each
stream a >L3-sized buffer (numpy copy + sum), report aggregate GB/s
and per-worker share.

The companion of scripts/cpu_probe.py: that probe is cache-resident
and measures CLOCK scaling only; parse-heavy Ray workers (parquet
decode + Arrow/Python string materialization) are BANDWIDTH-bound, so
the single-host scaling ceiling for the kg pipeline is
``per_worker_bw(HI) / per_worker_bw(LO)`` — the factor a fixed-size
multi-node cluster does NOT pay (every node brings its own memory
bus).  Used to decompose the bench.py --scaling efficiency into
hardware-bus vs software components in BASELINE.md.

Usage: python scripts/membw_probe.py [workers ...] (default 1 2 3 6 12 24 32)
"""

from __future__ import annotations

import multiprocessing as mp
import sys
import time

import numpy as np

BUF_MB = 256          # far beyond L3 so every pass streams from DRAM
PASSES_TARGET_S = 4.0  # per-worker measurement window


def _worker(q: mp.Queue) -> None:
    a = np.random.default_rng(0).integers(
        0, 255, BUF_MB * (1 << 20) // 8, dtype=np.int64
    )
    b = np.empty_like(a)
    # warm
    np.copyto(b, a)
    n_pass = 0
    t0 = time.perf_counter()
    while True:
        np.copyto(b, a)        # read + write one buffer each
        n_pass += 1
        dt = time.perf_counter() - t0
        if dt >= PASSES_TARGET_S:
            break
    # bytes moved per pass: read a + write b
    gb = n_pass * 2 * a.nbytes / 1e9
    q.put(gb / dt)


def measure(n: int) -> tuple[float, float]:
    q: mp.Queue = mp.Queue()
    procs = [mp.Process(target=_worker, args=(q,)) for _ in range(n)]
    for p in procs:
        p.start()
    rates = [q.get() for _ in procs]
    for p in procs:
        p.join()
    agg = sum(rates)
    return agg, agg / n


def main() -> None:
    counts = [int(x) for x in sys.argv[1:]] or [1, 2, 3, 6, 12, 24, 32]
    print(f"buffer {BUF_MB} MB/worker, copy passes, {PASSES_TARGET_S}s window")
    base = None
    for n in counts:
        agg, per = measure(n)
        if base is None:
            base = per
        print(
            f"{n:3d} workers: {agg:8.1f} GB/s aggregate, "
            f"{per:6.2f} per worker ({per / base:.3f}x of 1-worker)"
        )


if __name__ == "__main__":
    main()
