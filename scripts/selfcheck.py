"""Mimics the driver's correctness gate: run every queries() entry and
its oracle_sql() twin at a given sf, compare row count + schema +
order-insensitive values.
Usage: python scripts/selfcheck.py [sf_dir] [only=q1,q2,...]
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# Ray WORKERS do not inherit the driver's sys.path — export it so UDFs
# referencing the package deserialize in workers regardless of cwd
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def normalize(df):
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64").round(6)
        elif str(df[c].dtype).startswith(("int", "uint", "Int", "UInt")):
            # canonical width: DataFrame.equals is dtype-sensitive, and
            # ray-side int32 vs duckdb int64 would "fail" with 0
            # differing rows otherwise
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def to_pandas(res):
    import pandas as pd

    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()  # ray Dataset or pyarrow Table


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=8,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    only = None
    for a in sys.argv[2:]:
        if a.startswith("only="):
            only = set(a[len("only="):].split(","))
    if only:
        missing = only - set(qs)
        if missing:
            print(f"FAIL unknown query names: {sorted(missing)}")
            sys.exit(2)
        qs = {k: v for k, v in qs.items() if k in only}
    failures = 0
    for name, fn in qs.items():
        try:
            ray_df = normalize(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"FAIL {name}: ray side raised {ex!r}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(ray_df)} rows, no oracle)")
            continue
        try:
            sql_df = normalize(con.execute(oracles[name]).fetchdf())
        except Exception as ex:
            print(f"FAIL {name}: oracle raised {ex!r}")
            failures += 1
            continue
        if list(ray_df.columns) != list(sql_df.columns):
            print(f"FAIL {name}: columns {list(ray_df.columns)} vs {list(sql_df.columns)}")
            failures += 1
            continue
        if len(ray_df) != len(sql_df):
            print(f"FAIL {name}: rows {len(ray_df)} vs {len(sql_df)}")
            failures += 1
            continue
        if not ray_df.equals(sql_df):
            neq = (ray_df != sql_df).any(axis=1)
            print(f"FAIL {name}: {int(neq.sum())} differing rows, e.g.")
            print(ray_df[neq].head(3))
            print(sql_df[neq].head(3))
            failures += 1
            continue
        print(f"ok   {name}: {len(ray_df)} rows match")
    # smoke entry()
    res = e.entry()
    n = res.count() if hasattr(res, "iter_batches") else len(res)
    print(f"entry(): {n} rows")
    if failures:
        print(f"{failures} FAILURES")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
