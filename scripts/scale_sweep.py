"""Scale sweep: execute every `queries()` entry at a given sf_dir and
report per-query wall time + row count, slowest first — the tool that
answers "which operator becomes the cliff at 10x / 100x the
correctness scale" without waiting for a cluster.

    python scripts/scale_sweep.py [sf_dir] [only=a,b] [skip=c,d] \
        [budget=SECONDS]

Each query streams to a row count (iter_batches, no driver
materialization beyond what the query itself does).  `budget` (default
120 s) is a soft per-query limit: queries are run to completion, but
any query that exceeds it is flagged `over_budget` in the report so a
sweep over a big sf_dir degrades to a hotlist instead of hanging.
Prints ONE JSON line: {sf, num_cpus, total_sec, results: [{name, sec,
rows, over_budget}...]} sorted slowest-first.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only, skip, budget = None, set(), 120.0
    for a in sys.argv[2:]:
        if a.startswith("only="):
            only = set(a[5:].split(","))
        elif a.startswith("skip="):
            skip = set(a[5:].split(","))
        elif a.startswith("budget="):
            budget = float(a[7:])

    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    # session tuning the bench also applies: shuffle reduce-task count
    # proportional to cores (the 200 default drowns small exchanges)
    DataContext.get_current().min_parallelism = num_cpus * 2

    import pandas as pd
    import ray.data as rd

    import __ray_entry__ as e

    # warm the worker pool so the first query is not charged for forks
    rd.range(num_cpus * 1000, override_num_blocks=num_cpus).map_batches(
        lambda b: b, batch_format="pyarrow"
    ).count()

    qs = e.queries()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    results = []
    t_all = time.perf_counter()
    for name, fn in qs.items():
        if name in skip:
            continue
        t0 = time.perf_counter()
        err = None
        rows = 0
        try:
            res = fn(sf_dir)
            if isinstance(res, pd.DataFrame):
                rows = len(res)
            elif hasattr(res, "iter_batches"):  # ray Dataset
                for b in res.iter_batches(batch_format="pyarrow",
                                          batch_size=8192):
                    rows += b.num_rows
            else:  # pyarrow Table
                rows = res.num_rows
        except Exception as ex:  # noqa: BLE001 - sweep must finish
            err = f"{type(ex).__name__}: {ex}"[:200]
        sec = round(time.perf_counter() - t0, 2)
        r = {"name": name, "sec": sec, "rows": rows}
        if sec > budget:
            r["over_budget"] = True
        if err:
            r["err"] = err
        results.append(r)
        print(f"{sec:8.2f}s {rows:10d}  {name}"
              + (f"  ERR {err}" if err else ""), file=sys.stderr)
    results.sort(key=lambda r: -r["sec"])
    print(json.dumps({
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "total_sec": round(time.perf_counter() - t_all, 1),
        "n_queries": len(results),
        "n_errors": sum(1 for r in results if "err" in r),
        "results": results,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
