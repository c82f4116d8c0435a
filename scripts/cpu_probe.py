"""Host parallel-capacity probe: aggregate and per-worker throughput of
N CPU-bound workers (pure-Python busy loops, no Ray).

Used to separate SOFTWARE scaling from HARDWARE frequency scaling when
evidencing the north-rule efficiency criterion on a single node: a host
whose all-core turbo clock is X% below its few-core clock caps ANY
software's N-vs-4N efficiency at ~(1-X), which a real fixed-size
multi-node cluster (every node at the same clock) would not.  Record
the probe output next to the scaling numbers in BASELINE.md.

    python scripts/cpu_probe.py [counts ...]   # default 1 2 4 6 8 12 16 24 32
"""

from __future__ import annotations

import multiprocessing as mp
import sys
import time


def _burn(q, seconds: float) -> None:
    t0 = time.perf_counter()
    n = 0
    x = 0
    while time.perf_counter() - t0 < seconds:
        for _ in range(10000):
            x += 1
        n += 10000
    q.put(n)


def probe(counts, seconds: float = 3.0) -> list[dict]:
    out = []
    for n_workers in counts:
        q = mp.Queue()
        ps = [
            mp.Process(target=_burn, args=(q, seconds)) for _ in range(n_workers)
        ]
        for p in ps:
            p.start()
        total = sum(q.get() for _ in ps)
        for p in ps:
            p.join()
        agg = total / seconds / 1e6
        out.append(
            {
                "workers": n_workers,
                "aggregate_mops": round(agg, 1),
                "per_worker_mops": round(agg / n_workers, 2),
            }
        )
        print(
            f"{n_workers:3d} workers: {agg:8.1f} Mops/s aggregate, "
            f"{agg / n_workers:6.2f} per worker"
        )
    return out


if __name__ == "__main__":
    counts = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 6, 8, 12, 16, 24, 32]
    probe(counts)
