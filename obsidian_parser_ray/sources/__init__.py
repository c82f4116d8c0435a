"""Sources/sinks for the interleaved documents model.

The canonical input is a Lance/Parquet table with schema
``(doc_id: string, spans: list<struct<kind,text,media_ref,offset>>)``
(BASELINE.json ``input_hint``).  Readers here replace the reference's
directory walk (/root/reference/src/vault/vault_open/mod.rs:134-182):
file discovery becomes fragment planning inside the Ray Data reader,
and the walk filters (hidden files, extension, depth, custom
predicates — S2-S4) become vectorized filters on ``doc_id``.
"""

from __future__ import annotations

import pyarrow.compute as pc

from ..corpus import DOCUMENTS_SCHEMA, spans_from_raw, spans_table


def read_documents(path_or_dir: str, *, override_num_blocks: int | None = None):
    """Read an interleaved documents table (Lance if available and the
    path is a Lance dataset, else Parquet)."""
    import ray.data as rd

    kwargs = {}
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks
    if path_or_dir.endswith(".lance"):
        try:
            return rd.read_lance(path_or_dir, **kwargs)
        except (ImportError, ModuleNotFoundError) as e:  # lance not in container
            raise ImportError(
                "pylance is not installed in this environment; "
                "write the corpus as parquet instead"
            ) from e
    return rd.read_parquet(path_or_dir, **kwargs)


def from_markdown_items(items: list[tuple[str, str]], *, skip_errors: bool = True):
    """Build a documents Dataset from (doc_id, raw_markdown) pairs.

    The corpus-build normalization: raw file text → span rows via the
    reference-parity splitter.  ``skip_errors`` mirrors the reference's
    caller-chooses skip-vs-fail contract for unparseable notes
    (vault_open/mod.rs:358-429): True drops them, False raises.
    """
    import ray.data as rd

    rows = []
    for doc_id, raw in items:
        try:
            rows.append((doc_id, spans_from_raw(raw)))
        except Exception:
            if not skip_errors:
                raise
    return rd.from_arrow(spans_table(rows))


def filter_hidden(docs):
    """S3: exclude documents whose any path segment starts with ``.``
    (vault_open/mod.rs:60-64, default-on in the reference walk)."""

    def keep(batch):
        ids = batch["doc_id"]
        hidden = pc.match_substring_regex(ids, r"(^|/)\.")
        return batch.filter(pc.invert(hidden))

    return docs.map_batches(keep, batch_format="pyarrow")


def filter_depth(docs, *, min_depth: int = 1, max_depth: int | None = None):
    """S4: depth window over ``doc_id`` path depth (segments count)."""

    def keep(batch):
        ids = batch["doc_id"]
        n_sep = pc.count_substring(ids, "/")
        depth = pc.add(n_sep, 1)
        mask = pc.greater_equal(depth, min_depth)
        if max_depth is not None:
            mask = pc.and_(mask, pc.less_equal(depth, max_depth))
        return batch.filter(mask)

    return docs.map_batches(keep, batch_format="pyarrow")


def render_markdown(docs):
    """Documents (span rows) → ``(doc_id, raw_text)`` markdown file
    texts — the reference's note→file serialization
    (/root/reference/src/note/note_write.rs:77-95:
    ``---\\n{yaml}\\n---\\n{content}``; P13 SURVEY.md §2.2).

    Vectorizable only per row (string assembly), so it's a stateless
    ``map_batches`` over the span column — the inverse of the corpus
    normalization (:func:`obsidian_parser_ray.corpus.spans_from_raw`).
    """
    import pyarrow as pa

    from ..corpus import raw_from_spans

    def render(batch: pa.Table) -> pa.Table:
        spans_col = batch["spans"].to_pylist()
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "raw_text": pa.array(
                    [raw_from_spans(s or []) for s in spans_col], pa.string()
                ),
            }
        )

    return docs.map_batches(render, batch_format="pyarrow")


def write_markdown(docs, out_dir: str, *, dataset_id: str = "") -> dict:
    """Markdown round-trip sink (S7): rendered file texts as
    partitioned parquet + manifest (resumable, same layout contract as
    the triple sink).  ``dataset_id``: input fingerprint folded into
    the manifest lineage so a rerun with different input data rewrites
    instead of serving the stale manifest."""
    from ..state import write_partitioned_output

    return write_partitioned_output(
        render_markdown(docs), out_dir,
        lineage=f"render_markdown:{dataset_id}" if dataset_id
        else "render_markdown",
    )


def write_markdown_files(docs, out_dir: str) -> dict:
    """File-per-note markdown sink — the reference's ``NoteWrite::flush``
    (/root/reference/src/note/note_write.rs:77-95): one
    ``<out_dir>/<doc_id>.md`` per document, frontmatter re-serialized as
    ``---\\n{yaml}\\n---\\n{content}``.

    Files are written IN PARALLEL by the map tasks (no driver funnel);
    each task returns only its (n_files, n_bytes) partial.  At cluster
    scale ``out_dir`` must be shared storage (NFS/FUSE mount) — every
    worker writes its own batch's files.  Rewrites are idempotent
    (same content → same bytes).  Path safety: doc_ids must be
    relative paths without ``..`` segments.
    """
    import os

    import pyarrow as pa

    from ..corpus import raw_from_spans

    def write_batch(batch: pa.Table) -> pa.Table:
        n_files = 0
        n_bytes = 0
        for doc_id, spans in zip(
            batch["doc_id"].to_pylist(), batch["spans"].to_pylist()
        ):
            if doc_id.startswith("/") or ".." in doc_id.split("/"):
                raise ValueError(f"unsafe doc_id path: {doc_id!r}")
            path = os.path.join(out_dir, doc_id + ".md")
            os.makedirs(os.path.dirname(path), exist_ok=True)
            data = raw_from_spans(spans or []).encode("utf-8")
            with open(path, "wb") as f:
                f.write(data)
            n_files += 1
            n_bytes += len(data)
        return pa.table(
            {
                "n_files": pa.array([n_files], pa.int64()),
                "n_bytes_out": pa.array([n_bytes], pa.int64()),
            }
        )

    os.makedirs(out_dir, exist_ok=True)
    partials = docs.map_batches(write_batch, batch_format="pyarrow").to_pandas()
    return {
        "files": int(partials["n_files"].sum()),
        "bytes": int(partials["n_bytes_out"].sum()),
        "out_dir": out_dir,
    }


def read_markdown_dir(root: str, *, include_hidden: bool = False,
                      min_depth: int = 1, max_depth: int | None = None,
                      skip_errors: bool = True,
                      override_num_blocks: int | None = None):
    """Directory-walk vault reader (S1-S4 on REAL files): discover
    ``*.md`` under ``root`` (reference walk,
    /root/reference/src/vault/vault_open/mod.rs:134-182), read file
    BYTES in parallel Ray tasks (``read_binary_files``), and parse each
    file to span rows in the same tasks — only file names touch the
    driver.

    Walk filters mirror the reference defaults: hidden path segments
    (leading ``.``) excluded unless ``include_hidden``; depth window in
    path segments relative to ``root``.  ``skip_errors`` keeps the
    reference's caller-chooses skip-vs-fail contract for unparseable
    notes (vault_open/mod.rs:358-429).
    """
    import os

    import pyarrow as pa
    import ray.data as rd

    from ..corpus import spans_from_raw, spans_table

    paths = []
    for dirpath, dirnames, filenames in os.walk(root):
        rel = os.path.relpath(dirpath, root)
        if not include_hidden:
            dirnames[:] = [d for d in dirnames if not d.startswith(".")]
        for fn in sorted(filenames):
            if not fn.endswith(".md"):
                continue
            if not include_hidden and fn.startswith("."):
                continue
            rel_file = fn if rel == "." else f"{rel}/{fn}"
            depth = rel_file.count("/") + 1
            if depth < min_depth or (max_depth is not None and depth > max_depth):
                continue
            paths.append(os.path.join(dirpath, fn))
    if not paths:
        return rd.from_arrow(spans_table([]))

    kwargs = {}
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks
    files = rd.read_binary_files(paths, include_paths=True, **kwargs)
    prefix = os.path.abspath(root) + os.sep

    def parse_files(batch: pa.Table) -> pa.Table:
        rows = []
        for path, data in zip(
            batch["path"].to_pylist(), batch["bytes"].to_pylist()
        ):
            abs_path = os.path.abspath(path)
            doc_id = abs_path[len(prefix):] if abs_path.startswith(prefix) \
                else os.path.basename(abs_path)
            doc_id = doc_id[:-3]  # strip '.md'
            try:
                rows.append((doc_id, spans_from_raw(data.decode("utf-8"))))
            except Exception:
                if not skip_errors:
                    raise
        return spans_table(rows)

    return files.map_batches(parse_files, batch_format="pyarrow")


__all__ = [
    "DOCUMENTS_SCHEMA",
    "filter_depth",
    "filter_hidden",
    "from_markdown_items",
    "read_documents",
    "read_markdown_dir",
    "render_markdown",
    "write_markdown",
    "write_markdown_files",
]


def read_parquet_evolved(paths, target_schema, *,
                         override_num_blocks: int | None = None):
    """Schema-drift-tolerant parquet read: conform every file to
    ``target_schema`` (a ``pyarrow.Schema``) regardless of which
    columns each shard actually has.

    A 100 TB corpus accretes over months; old shards predate new
    columns and new shards drop deprecated ones.  Rules, applied per
    batch (pure map — the read itself stays streaming/block-parallel):

    * missing column        → typed nulls
    * extra column          → dropped
    * same-kind widening    → cast (int→wider int, float→wider float,
      int→float; anything else must match exactly — a lossy or
      cross-kind mismatch raises rather than corrupting silently)
    * column order          → target order

    Output schema == ``target_schema`` for every block, so downstream
    unions/joins never see ragged schemas.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    def _safe_cast(col, want: pa.DataType, name: str):
        have = col.type
        if have.equals(want):
            return col
        ok = (
            (pa.types.is_integer(have) and pa.types.is_integer(want)
             and want.bit_width >= have.bit_width
             and pa.types.is_signed_integer(have)
             == pa.types.is_signed_integer(want))
            or (pa.types.is_floating(have) and pa.types.is_floating(want)
                and want.bit_width >= have.bit_width)
            or (pa.types.is_integer(have) and pa.types.is_floating(want))
            or (pa.types.is_string(have)
                and pa.types.is_large_string(want))
        )
        if not ok:
            raise TypeError(
                f"column {name!r}: refusing lossy/cross-kind cast "
                f"{have} -> {want}"
            )
        return pc.cast(col, want)

    def conform(t: pa.Table) -> pa.Table:
        cols = []
        for field in target_schema:
            if field.name in t.column_names:
                c = t[field.name]
                if isinstance(c, pa.ChunkedArray):
                    c = c.combine_chunks()
                cols.append(_safe_cast(c, field.type, field.name))
            else:
                cols.append(pa.nulls(t.num_rows, field.type))
        return pa.Table.from_arrays(cols, schema=target_schema)

    ds = rd.read_parquet(
        paths, override_num_blocks=override_num_blocks,
    )
    return ds.map_batches(conform, batch_format="pyarrow")


def read_jsonl_shards(shard_dir: str, *, columns=None,
                      override_num_blocks: int | None = None):
    """Read a `chunking.export_jsonl_shards` directory back as a
    Dataset — the ingest half of the JSONL round trip (training stacks
    write JSONL; downstream jobs re-read it here without a conversion
    step).

    Validates against the exporter's manifest when present (shard
    count + per-shard on-disk byte size — a zero-read
    corruption/partial-write check, valid because the export is
    byte-reproducible) and reads the ``.jsonl[.gz]`` files
    block-parallel via ``ray.data.read_json``.
    """
    import glob
    import json
    import os

    import ray.data as rd

    paths = sorted(
        p for ext in ("*.jsonl", "*.jsonl.gz")
        for p in glob.glob(os.path.join(shard_dir, ext))
    )
    if not paths:
        raise FileNotFoundError(f"no .jsonl shards under {shard_dir}")
    man_path = os.path.join(shard_dir, "_MANIFEST.json")
    if os.path.exists(man_path):
        with open(man_path) as f:
            man = json.load(f)
        if len(paths) != len(man.get("shards", [])):
            raise ValueError(
                f"shard count mismatch: {len(paths)} files vs "
                f"{len(man['shards'])} in the manifest — partial "
                "export or stray files"
            )
        # per-shard ON-DISK byte sizes are recorded by the exporter and
        # the export is byte-reproducible, so a stat() compare catches
        # truncated / corrupted / swapped shards without reading (let
        # alone JSON-parsing) any data — the dataset below stays the
        # single ingest pass
        sizes = {
            int(r["shard"]): int(r["bytes"])
            for r in man.get("shards", [])
        }
        for p in paths:
            stem = os.path.basename(p).split(".")[0]  # shard-00007
            shard = int(stem.rsplit("-", 1)[1])
            if shard not in sizes:
                raise ValueError(
                    f"shard file {p} not present in the manifest"
                )
            got = os.path.getsize(p)
            if got != sizes[shard]:
                raise ValueError(
                    f"shard {shard} size mismatch: {got} bytes on "
                    f"disk, manifest says {sizes[shard]} — truncated "
                    "or corrupted export"
                )
    kwargs = {}
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks
    ds = rd.read_json(
        paths, arrow_open_stream_args={"compression": "gzip"}
        if paths[0].endswith(".gz") else None, **kwargs,
    )
    if columns:
        ds = ds.select_columns(list(columns))
    return ds
