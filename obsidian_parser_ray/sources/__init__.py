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


__all__ = [
    "DOCUMENTS_SCHEMA",
    "filter_depth",
    "filter_hidden",
    "from_markdown_items",
    "read_documents",
    "render_markdown",
    "write_markdown",
]
