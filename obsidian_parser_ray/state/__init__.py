"""Checkpoint / resume / lineage-metrics support (north_rule: "resumable
from checkpoint with per-partition lineage + metrics").

A checkpoint is a directory of parquet part files plus a
``_MANIFEST.json`` recording row count, schema, wall time and the
pipeline-stage lineage string.  Writes are atomic: data lands in
``<dir>.tmp`` and is renamed into place only after the manifest is
written, so a crashed run never leaves a half checkpoint that a resume
would trust.  ``checkpoint_dataset`` skips recompute when a valid
manifest is already present — that IS the resume path: rerunning a
pipeline with the same ``checkpoint_dir`` re-reads finished stages and
re-executes only what's missing.
"""

from __future__ import annotations

import json
import os
import shutil
import time


def manifest_path(path: str) -> str:
    return os.path.join(path, "_MANIFEST.json")


def load_manifest(path: str) -> dict | None:
    mp = manifest_path(path)
    if not os.path.exists(mp):
        return None
    try:
        with open(mp) as f:
            return json.load(f)
    except Exception:
        return None


def checkpoint_dataset(ds, path: str, *, lineage: str = "", resume: bool = True):
    """Materialize ``ds`` to a resumable parquet checkpoint, return a
    fresh Dataset reading from it.

    At 100 TB this is the alternative to ``materialize()`` — the
    checkpoint lives on shared storage, bounds object-store pressure,
    and makes every downstream consumer restartable without replaying
    the upstream lineage.
    """
    import ray.data as rd

    if resume:
        m = load_manifest(path)
        if m is not None and m.get("lineage") == lineage:
            return rd.read_parquet(path, file_extensions=["parquet"])
        # lineage mismatch = the checkpoint belongs to a DIFFERENT
        # pipeline stage/shape → recompute rather than silently serving
        # stale data

    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    t0 = time.perf_counter()
    ds.write_parquet(tmp)
    # per-partition metrics from parquet footers (no data re-read):
    # each output file is one resumable partition — a downstream
    # consumer can skip, retry, or audit partitions individually.
    import pyarrow.parquet as pq

    partitions = {}
    for f in sorted(os.listdir(tmp)):
        if f.endswith(".parquet"):
            md = pq.ParquetFile(os.path.join(tmp, f)).metadata
            partitions[f] = {
                "rows": md.num_rows,
                "bytes": os.path.getsize(os.path.join(tmp, f)),
                "row_groups": md.num_row_groups,
            }
    n_rows = sum(p["rows"] for p in partitions.values())
    manifest = {
        "rows": n_rows,
        "lineage": lineage,
        "wall_sec": round(time.perf_counter() - t0, 3),
        "files": sorted(partitions),
        "partitions": partitions,
        "written_at": time.time(),
    }
    with open(manifest_path(tmp), "w") as f:
        json.dump(manifest, f, indent=1)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(tmp, path)
    return rd.read_parquet(path, file_extensions=["parquet"])


def write_partitioned_output(triples, out_dir: str, *, lineage: str = "",
                             num_partitions: int | None = None) -> dict:
    """Final sink: partitioned parquet + manifest (resumable output).

    ``num_partitions`` coalesces/splits output files (order-preserving
    repartition — sorted runs stay sorted); size it so each partition
    is a few hundred MB at scale.
    """
    import ray.data as rd

    m = load_manifest(out_dir)
    if m is not None and m.get("lineage") == lineage:
        return m
    if num_partitions is not None:
        triples = triples.repartition(num_partitions)
    checkpoint_dataset(triples, out_dir, lineage=lineage, resume=False)
    return load_manifest(out_dir)


def incremental_sum_view(base_dir: str, delta, *, keys: list[str],
                         sums: list[str],
                         num_partitions: int = 64) -> dict:
    """Persisted additive materialized view: per-``keys`` integer sums
    maintained under delta batches, touching ONLY the key-hash
    buckets a delta mentions.

    Additive aggregates are the easy incremental case — new partials
    simply add — so an update is: fold the delta to per-key partials,
    union with the AFFECTED buckets' stored rows, one groupby-sum per
    bucket, rewrite those buckets (fixed ``.next`` temp name +
    driver rename — per-bucket atomic, idempotent under task retry;
    the same contract as the session store).  Layout:
    ``{base_dir}/view/bucket=<n>/data.parquet`` +
    ``_VIEW_MANIFEST.json`` pinning (keys, sums, buckets).

    Returns {"buckets_touched": int, "rows_written": int}.
    """
    import json
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd

    from ..hashing import hash_bucket_array

    view_root = os.path.join(base_dir, "view")
    man_path = os.path.join(base_dir, "_VIEW_MANIFEST.json")
    if os.path.exists(man_path):
        with open(man_path) as f:
            man = json.load(f)
        if (man["keys"] != list(keys) or man["sums"] != list(sums)
                or man["num_partitions"] != num_partitions):
            raise ValueError(
                "view parameters differ from manifest: " + str(man)
            )
    else:
        os.makedirs(view_root, exist_ok=True)
        man = {"keys": list(keys), "sums": list(sums),
               "num_partitions": num_partitions}
        with open(man_path, "w") as f:
            json.dump(man, f)

    def _bucket_col(t: pa.Table) -> pa.Array:
        if len(keys) == 1:
            kk = pc.cast(t[keys[0]], pa.string())
        else:
            kk = pc.binary_join_element_wise(
                *[pc.cast(t[c], pa.string()) for c in keys], "\x00"
            )
        return hash_bucket_array(kk, num_partitions)

    def partial(t: pa.Table) -> pa.Table:
        flat = t.select(list(keys) + list(sums))
        g = flat.group_by(list(keys)).aggregate(
            [(c, "sum") for c in sums]
        )
        g = g.rename_columns([
            c[:-4] if c.endswith("_sum") else c for c in g.column_names
        ])
        return g.append_column("bucket", _bucket_col(g))

    d = delta.map_batches(partial, batch_format="pyarrow")
    touched = sorted({
        r["bucket"]
        for b in d.map_batches(
            lambda t: t.select(["bucket"]).group_by("bucket")
            .aggregate([]),
            batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    })
    if not touched:
        return {"buckets_touched": 0, "rows_written": 0}

    existing = [
        p for p in (
            os.path.join(view_root, f"bucket={b}", "data.parquet")
            for b in touched
        ) if os.path.exists(p)
    ]
    parts = [d]
    if existing:
        def tag(t: pa.Table) -> pa.Table:
            return t.append_column("bucket", _bucket_col(t))

        parts.append(
            rd.read_parquet(existing, columns=list(keys) + list(sums))
            .map_batches(tag, batch_format="pyarrow")
        )
    merged = parts[0] if len(parts) == 1 else parts[0].union(
        *parts[1:]
    )

    def merge_write(p):
        import pandas as pd

        b = int(p["bucket"].iloc[0])
        g = (
            p.drop(columns=["bucket"])
            .groupby(list(keys), as_index=False)[list(sums)].sum()
        )
        dpath = os.path.join(view_root, f"bucket={b}")
        os.makedirs(dpath, exist_ok=True)
        pq.write_table(
            pa.Table.from_pandas(g, preserve_index=False),
            os.path.join(dpath, "data.parquet.next"),
        )
        return pd.DataFrame({"bucket": [b], "rows": [len(g)]})

    stats = (
        merged.groupby("bucket")
        .map_groups(merge_write, batch_format="pandas")
        .take_all()
    )
    rows = 0
    for r in stats:
        dpath = os.path.join(view_root, f"bucket={int(r['bucket'])}")
        os.replace(os.path.join(dpath, "data.parquet.next"),
                   os.path.join(dpath, "data.parquet"))
        rows += int(r["rows"])
    return {"buckets_touched": len(stats), "rows_written": rows}


def read_sum_view(base_dir: str):
    """Read the full materialized view as a Dataset (keys + sums)."""
    import glob
    import os

    import ray.data as rd

    paths = sorted(
        glob.glob(os.path.join(base_dir, "view", "bucket=*",
                               "data.parquet"))
    )
    if not paths:
        raise FileNotFoundError(f"no sum view under {base_dir}")
    ds = rd.read_parquet(paths)
    if "bucket" in ds.schema().names:
        ds = ds.drop_columns(["bucket"])
    return ds
