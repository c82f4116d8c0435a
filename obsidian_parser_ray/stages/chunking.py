"""Training-data export operators: document chunking + shuffled shards.

* :func:`chunk_documents` — split each document into overlapping
  word-window chunks (``flat_map``-shaped explode done vectorized in
  ``map_batches``).  Deterministic; chunk text joins words with single
  spaces (whitespace-normalizing, documented) so the DuckDB oracle can
  reproduce every chunk exactly.
* :func:`export_training_shards` — deterministic ``random_shuffle``
  (seeded) + fixed shard count + manifest: the standard "shuffle once,
  shard for epoch reading" layout.
* :func:`export_jsonl_shards` — byte-reproducible JSONL shards
  (content-defined sharding, no shuffle exchange).
* :func:`deterministic_sample_per_key` / :func:`hash_split` —
  md5-ordered stratified sampling and train/val/test assignment
  (oracle-replayable, stable under corpus growth).
* :func:`pack_sequences` — fixed-token-capacity sequence packing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def chunk_rows(text: str, window: int, stride: int) -> list[tuple[int, str, int]]:
    """One document → [(chunk_idx, chunk_text, n_tokens)].

    Whitespace tokens; windows of ``window`` words advancing by
    ``stride``; the final window is truncated, never padded; documents
    with no tokens produce no chunks.
    """
    words = text.split()
    n = len(words)
    if n == 0:
        return []
    out = []
    idx = 0
    start = 0
    while True:
        end = min(start + window, n)
        out.append((idx, " ".join(words[start:end]), end - start))
        if end >= n:
            break
        idx += 1
        start += stride
    return out


def chunk_documents(ds, *, window: int = 200, overlap: int = 50,
                    text_col: str = "text", id_col: str = "doc_id",
                    batch_size: int | None = 512):
    """documents → chunk rows ``(doc_id, chunk_idx, chunk_text, n_tokens)``."""
    if not 0 <= overlap < window:
        raise ValueError("require 0 <= overlap < window")
    stride = window - overlap
    sch = ds.schema()
    id_t = dict(zip(sch.names, sch.types))[id_col]

    def explode(t: pa.Table) -> pa.Table:
        ids, idxs, texts, counts = [], [], [], []
        for doc_id, text in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            for idx, chunk, n_tok in chunk_rows(text or "", window, stride):
                ids.append(doc_id)
                idxs.append(idx)
                texts.append(chunk)
                counts.append(n_tok)
        return pa.table(
            {
                id_col: pa.array(ids, id_t),
                "chunk_idx": pa.array(idxs, pa.int64()),
                "chunk_text": pa.array(texts, pa.string()),
                "n_tokens": pa.array(counts, pa.int64()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow", batch_size=batch_size)


def export_training_shards(ds, out_dir: str, *, num_shards: int = 16,
                           seed: int = 42, dataset_id: str = "",
                           lineage: str | None = None) -> dict:
    """Deterministic shuffle + sharded parquet export + manifest.

    ``random_shuffle(seed)`` is a full shuffle by design (that IS the
    operator); shard count fixes the output layout so epoch readers
    can assign shards to workers.  Returns the manifest (per-partition
    rows/bytes from :func:`state.write_partitioned_output`).

    Resume semantics are LINEAGE-keyed: a rerun with the same
    (seed, num_shards, dataset_id) returns the existing manifest
    without rewriting.  Pass ``dataset_id`` (corpus version/content
    fingerprint) when the underlying data can change between runs —
    the config alone cannot detect new data.
    """
    from ..state import write_partitioned_output

    if lineage is None:
        lineage = (
            f"training_shards(seed={seed},shards={num_shards},"
            f"dataset={dataset_id})"
        )
    shuffled = ds.random_shuffle(seed=seed).repartition(num_shards)
    return write_partitioned_output(shuffled, out_dir, lineage=lineage)


def deterministic_sample_per_key(ds, *, key_col: str, id_col: str,
                                 k: int, batch_size: int | None = None):
    """Deterministic stratified sample: the ``k`` rows with the
    smallest ``md5(id)`` per key — the balanced per-source /
    per-language subset a training-data pipeline draws.

    Hash-ordered selection makes the sample (a) deterministic across
    runs and cluster sizes, (b) uniform (md5 is effectively a random
    permutation of ids), and (c) EXACTLY reproducible in SQL
    (``row_number() over (partition by key order by md5(id), id)``),
    so the op is oracle-checked — unlike seeded RNG sampling, which no
    SQL engine can replay.

    Dataflow: per-block partial top-k per key inside ``map_batches``
    (the shuffle carries at most k rows per key per block), then a
    tiny ``groupby(key)`` merge — the same partial-top-k shape as
    ``knn_bruteforce``, never a global sort.
    """
    import hashlib

    import pandas as pd
    import pyarrow as pa

    def add_rank(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        h = [hashlib.md5(str(i).encode("utf-8")).hexdigest() for i in ids]
        return t.append_column("_h", pa.array(h, pa.string()))

    def partial_topk(p: pd.DataFrame) -> pd.DataFrame:
        return (
            p.sort_values(["_h", id_col], kind="stable")
            .groupby(key_col, sort=False)
            .head(k)
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.sort_values(["_h", id_col], kind="stable").head(k)
        return out.drop(columns=["_h"])

    partials = ds.map_batches(
        add_rank, batch_format="pyarrow", batch_size=batch_size
    ).map_batches(partial_topk, batch_format="pandas", batch_size=batch_size)
    return partials.groupby(key_col).map_groups(merge, batch_format="pandas")


def pack_sequences(chunks, *, capacity: int, token_col: str = "n_tokens",
                   id_col: str = "doc_id", order_col: str = "chunk_idx",
                   num_partitions: int = 64,
                   strategy: str = "next_fit"):
    """Pack chunk rows into fixed-token-capacity training sequences —
    the last preprocessing step before batching a causal-LM corpus.

    Distributed shape: rows hash-partition by ``id_col`` (a document's
    chunks co-locate), each partition packs ITS rows independently.
    Global bin ids are ``part * 2^32 + seq``, so no cross-partition
    coordination exists at any scale.  Two strategies:

    * ``"next_fit"`` (default): deterministic next-fit over the
      ``(id, order)`` sort order — bins are consecutive runs (a doc's
      chunks stay contiguous within and across bins), found with an
      O(n_bins log n) cumsum + searchsorted sweep (no per-row Python);
    * ``"ffd"``: first-fit-decreasing — chunks sorted by token count
      descending (stable over the same (id, order) order), each placed
      in the lowest-numbered bin that fits.  Measurably higher fill at
      the same contract, at the cost of doc-chunk contiguity within
      bins and an O(n × bins) worst-case Python sweep per partition
      (partitions are bounded by ``num_partitions``; the vectorized
      next-fit stays the default for corpus-scale runs).

    Guarantees in BOTH modes (gate-checked by the ``doc_pack`` driver
    query in the default mode, pytest-checked in ffd):

    * every bin's fill ≤ ``capacity``, EXCEPT single-chunk bins whose
      one chunk alone exceeds capacity (they are emitted alone and
      flagged ``oversize`` rather than dropped — token counts are
      preserved exactly; an oversize bin never receives a second
      chunk in either mode);
    * token totals in == out (packing moves rows, never edits them);
    * next-fit on consecutive runs wastes < capacity per bin
      boundary: every non-final bin of a partition has
      fill + next_chunk > capacity, so avg fill of non-final bins
      exceeds capacity − max_chunk_tokens.

    Returns the chunk rows + ``(bin_id: int64, bin_fill: int64,
    oversize: bool)``.
    """
    import pyarrow.compute as pc

    from ..hashing import hash_bucket_array

    if strategy not in ("next_fit", "ffd"):
        raise ValueError(
            f"strategy must be 'next_fit' or 'ffd', got {strategy!r}"
        )

    def tag(t: pa.Table) -> pa.Table:
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return t.append_column("part", hash_bucket_array(ids, num_partitions))

    def pack_partition(g: pa.Table) -> pa.Table:
        g = g.sort_by([(id_col, "ascending"), (order_col, "ascending")])
        toks = g[token_col].combine_chunks().to_numpy()
        n = len(toks)
        part = int(g["part"][0].as_py())
        if strategy == "ffd":
            order = np.argsort(-toks.astype(np.int64), kind="stable")
            bins_rem: list = []   # remaining capacity per bin
            fill_list: list = []
            bin_of = np.empty(n, dtype=np.int64)
            for idx in order:
                ti = int(toks[idx])
                placed = -1
                if ti <= capacity:
                    for b, rem in enumerate(bins_rem):
                        if rem >= ti:
                            placed = b
                            break
                if placed < 0:
                    placed = len(bins_rem)
                    # an oversize chunk opens a bin with negative
                    # remainder: nothing else (not even a 0-token
                    # chunk) can join it
                    bins_rem.append(capacity - ti)
                    fill_list.append(ti)
                else:
                    bins_rem[placed] -= ti
                    fill_list[placed] += ti
                bin_of[idx] = placed
            fills = np.asarray(fill_list, dtype=np.int64)
        else:
            cs = np.cumsum(toks.astype(np.int64))
            bin_of = np.empty(n, dtype=np.int64)
            fill_list = []
            start = 0
            seq = 0
            while start < n:
                base = cs[start - 1] if start else 0
                j = int(np.searchsorted(cs, base + capacity, side="right"))
                j = max(j, start + 1)  # an oversize chunk rides alone
                bin_of[start:j] = seq
                fill_list.append(int((cs[j - 1] - base)))
                seq += 1
                start = j
            fills = np.asarray(fill_list, dtype=np.int64)
        bin_fill = fills[bin_of]
        oversize = bin_fill > capacity
        out = g.drop_columns(["part"])
        out = out.append_column(
            "bin_id",
            pa.array(bin_of + (np.int64(part) << np.int64(32)), pa.int64()),
        )
        out = out.append_column("bin_fill", pa.array(bin_fill, pa.int64()))
        return out.append_column("oversize", pa.array(oversize, pa.bool_()))

    return (
        chunks.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pack_partition, batch_format="pyarrow")
    )


def sample_mixture(ds, *, key_col: str, fractions: dict, id_col: str,
                   batch_size: int | None = None):
    """Proportional mixture sampling: keep ``floor(frac[key] × n_key)``
    rows per key, chosen as the smallest-``md5(id)`` subset — the
    training-mix construction step ("30% of source A, 5% of source
    B"), deterministic across runs and cluster layouts and EXACTLY
    reproducible in SQL (``row_number() over (partition by key order
    by md5(id), id)`` against per-key counts).  Keys absent from
    ``fractions`` are dropped.

    Dataflow: one tiny groupby for the per-key counts (the quota
    input), then the same partial-top-k shape as
    :func:`deterministic_sample_per_key` with per-key quotas — the
    shuffle carries at most ``quota_k`` rows per key per block.
    """
    import hashlib

    from ray.data.aggregate import Count

    counts = {
        r[key_col]: r["n"]
        for r in ds.groupby(key_col).aggregate(Count(alias_name="n"))
        .take_all()
    }
    quotas = {
        k: int(fractions[k] * counts.get(k, 0))
        for k in fractions
    }

    def add_rank(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        h = [hashlib.md5(str(i).encode("utf-8")).hexdigest() for i in ids]
        return t.append_column("_h", pa.array(h, pa.string()))

    import pandas as pd

    def partial_topk(p: pd.DataFrame) -> pd.DataFrame:
        p = p[p[key_col].isin(quotas)]
        if not len(p):
            return p.drop(columns=["_h"], errors="ignore")
        p = p.sort_values(["_h", id_col], kind="stable")
        return p.groupby(key_col, sort=False, group_keys=False).apply(
            lambda g: g.head(quotas[g.name])
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return g.drop(columns=["_h"], errors="ignore")
        key = g[key_col].iloc[0]
        out = g.sort_values(["_h", id_col], kind="stable").head(
            quotas.get(key, 0)
        )
        return out.drop(columns=["_h"])

    partials = ds.map_batches(
        add_rank, batch_format="pyarrow", batch_size=batch_size
    ).map_batches(partial_topk, batch_format="pandas")
    return partials.groupby(key_col).map_groups(
        merge, batch_format="pandas"
    )


def hash_split(ds, *, id_col: str = "doc_id", pcts: tuple = (80, 90),
               labels: tuple = ("train", "val", "test")):
    """Deterministic train/val/test assignment by content-independent
    key hash: ``md5(str(id))`` first 8 hex chars mod 100 → bucket,
    bucket < pcts[0] → labels[0], < pcts[1] → labels[1], else
    labels[2].

    The md5 (rather than the repo's xxhash-style kernels) is
    oracle-mandated: DuckDB's ``md5()`` is the only hash both engines
    share bit-for-bit, so the SQL twin can reproduce every assignment.
    Pure map — no shuffle, stable under any re-partitioning, and the
    assignment of a document never changes as the corpus grows (the
    property hash-splits exist for).

    Output: input columns + ``split``.
    """
    import hashlib

    if not (len(pcts) == 2 and len(labels) == 3 and pcts[0] < pcts[1]):
        raise ValueError("need pcts=(lo, hi) with lo < hi and 3 labels")
    lo, hi = pcts
    lab = np.asarray(labels, dtype=object)

    def assign(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        bucket = np.fromiter(
            (
                int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100
                for i in ids
            ),
            dtype=np.int64,
            count=len(ids),
        )
        which = np.where(bucket < lo, 0, np.where(bucket < hi, 1, 2))
        return t.append_column("split", pa.array(lab[which]))

    return ds.map_batches(assign, batch_format="pyarrow")


def export_jsonl_shards(ds, out_dir: str, *, num_shards: int = 16,
                        seed: int = 42, compression: str = "gzip",
                        suffix: str | None = None) -> dict:
    """Deterministically shuffled, sharded JSONL export — the
    interchange format most training stacks ingest directly.

    The "shuffle" is content-defined, not positional: each row's shard
    is a stable hash of its serialized content, and rows within a
    shard are written in canonical (serialized-bytes) order — so the
    output is BYTE-IDENTICAL across reruns and input partitionings
    without paying a ``random_shuffle`` exchange, while still being
    decorrelated from source order (hash order ≈ random order).
    ``seed`` is recorded in the manifest for lineage but does not
    change bytes.  Each shard file lands via ``.next`` + rename; the
    manifest is written LAST, so a crash leaves data files but no
    manifest — the rerun signal (same contract as the parquet shard
    exporter).  Values must be JSON-representable (ints, floats,
    strings, lists); binary columns should be dropped or hex-encoded
    upstream.
    """
    import gzip
    import json
    import os

    if suffix is None:
        suffix = ".jsonl.gz" if compression == "gzip" else ".jsonl"
    os.makedirs(out_dir, exist_ok=True)

    def write_shard(p, ctx=None):
        # map_groups over the shard id — one task per shard
        import pandas as pd

        shard = int(p["_shard"].iloc[0])
        path = os.path.join(out_dir, f"shard-{shard:05d}{suffix}")
        lines = sorted(
            json.dumps(
                {k: v for k, v in rec.items() if k != "_shard"},
                sort_keys=True, default=str,
            )
            for rec in p.to_dict(orient="records")
        )
        body = ("\n".join(lines) + "\n" if lines else "").encode()
        tmp = path + ".next"
        if compression == "gzip":
            # mtime=0 → byte-identical reruns
            with open(tmp, "wb") as f:
                with gzip.GzipFile(fileobj=f, mode="wb", mtime=0) as g:
                    g.write(body)
        else:
            with open(tmp, "wb") as f:
                f.write(body)
        os.replace(tmp, path)
        return pd.DataFrame({
            "shard": [shard], "rows": [len(p)],
            "bytes": [os.path.getsize(path)],
        })

    # shard assignment must survive reruns and task retries, so it
    # hashes the row CONTENT (stable repo hash, not process-salted
    # builtin hash) rather than any positional index
    from ..hashing import hash_bucket_array

    def tag_stable(t: pa.Table) -> pa.Table:
        import json as _json

        keys = pa.array(
            [_json.dumps(r, sort_keys=True, default=str)
             for r in t.to_pylist()],
            pa.string(),
        )
        return t.append_column(
            "_shard",
            pa.array(
                hash_bucket_array(keys, num_shards).to_numpy()
                .astype(np.int64)
            ),
        )

    stats = (
        ds.map_batches(tag_stable, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(write_shard, batch_format="pandas")
        .take_all()
    )
    manifest = {
        "num_shards": num_shards,
        "seed": seed,
        "shards": sorted(
            ({"shard": int(r["shard"]), "rows": int(r["rows"]),
              "bytes": int(r["bytes"])} for r in stats),
            key=lambda x: x["shard"],
        ),
        "total_rows": int(sum(r["rows"] for r in stats)),
    }
    import json as _json

    with open(os.path.join(out_dir, "_MANIFEST.json"), "w") as f:
        _json.dump(manifest, f, indent=1)
    return manifest
