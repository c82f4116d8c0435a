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
