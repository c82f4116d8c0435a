"""Deterministic interleaved-document corpora (the KG input table).

The engine's input model (BASELINE.json ``input_hint``) is a table of
interleaved text + media documents::

    doc_id: string
    spans:  list<struct<kind: string, text: string,
                        media_ref: string, offset: int32>>

Three deterministic generators live here:

1. :func:`derive_vault_batch` / :func:`synth_vault` — derive a vault
   from the driver's ``documents.parquet`` table (columns
   ``doc_id:int64, lang:string``) with rules simple enough that the
   expected knowledge-graph output is *analytically computable in SQL*
   (see :func:`oracle_cte`).  This powers the driver's
   queries()/oracle_sql() correctness gate.
2. :func:`bench_corpus` — the reference's criterion bench workload
   shape (/root/reference/benches/benchmarks.rs:15-70: N files,
   ``links_per_file`` link blocks padded with 50-100 filler lines,
   frontmatter ``id: <i>``), seeded per-doc so generation is
   deterministic AND embarrassingly parallel.
3. :func:`spans_from_raw` — raw markdown → span rows (the
   corpus-build normalization; uses the parity splitter).

Every generator emits spans with contiguous 0-based ``offset`` so the
per-row span-sequence invariant ``(kind, text, media_ref, order)`` is
well-defined and checkable (:func:`span_signature`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .parser import NotFoundCloser, parse_note

SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)
DOCUMENTS_SCHEMA = pa.schema([("doc_id", pa.string()), ("spans", pa.list_(SPAN_TYPE))])


def make_span(kind: str, text: str = "", media_ref: str = "", offset: int = 0) -> dict:
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def spans_table(rows: list[tuple[str, list[dict]]]) -> pa.Table:
    """Build a documents table from ``[(doc_id, [span_dict, ...]), ...]``."""
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.string()),
            "spans": pa.array([r[1] for r in rows], pa.list_(SPAN_TYPE)),
        }
    )


def spans_from_raw(raw_text: str) -> list[dict]:
    """Raw markdown file text → span list (corpus-build normalization).

    Frontmatter (reference split semantics, parser.rs:58-76) becomes a
    ``kind='frontmatter'`` span; the remaining (trimmed) body becomes a
    single ``kind='text'`` span.  An unclosed frontmatter raises
    :class:`obsidian_parser_ray.parser.NotFoundCloser` — callers decide
    skip-vs-fail, mirroring the reference's per-note Result contract.
    """
    parsed = parse_note(raw_text)
    spans = []
    off = 0
    if parsed.properties is not None:
        spans.append(make_span("frontmatter", parsed.properties, offset=off))
        off += 1
    spans.append(make_span("text", parsed.content, offset=off))
    return spans


def raw_from_spans(spans: list[dict]) -> str:
    """Reference-equivalent raw file text of a span row (FIXTURES.md)."""
    ordered = sorted(spans, key=lambda s: s["offset"])
    fm = [s["text"] for s in ordered if s["kind"] == "frontmatter"]
    body = "\n".join(s["text"] for s in ordered if s["kind"] == "text")
    if fm:
        return f"---\n{fm[0]}\n---\n{body}"
    return body


def span_signature(spans_column: pa.ChunkedArray | pa.Array) -> list[list[tuple]]:
    """Canonical per-row tuple sequence for invariant checks."""
    if isinstance(spans_column, pa.ChunkedArray):
        spans_column = spans_column.combine_chunks()
    return [
        [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in row]
        for row in spans_column.to_pylist()
    ]


# ---------------------------------------------------------------------------
# 1. Oracle-checkable vault derived from the driver's `documents` table.
#
# SPEC (mirrored EXACTLY by oracle_cte() — change both together):
#   For each documents row (d = doc_id int64 in 0..N-1, lang):
#     MAIN note, key = 'note_{d}':
#       frontmatter: id + tags [lang, 'todo' if d%13==0] +
#                    aliases ['alias_{d}'] if d%5==0
#       text: "Body {d} has words. See [[note_{L1}]] and again
#              [[note_{L1}|alias text]]. #tag_{d%7} inline."
#              with L1 = (7d+3) % N
#       if d%4==0: text "Embed here ![[note_{L2}]] ok.", L2 = (3d+1) % N
#       if d%5==1: text "Alias link [[alias_{A}]] end.",
#                  A = 5 * (d % (N//5))   (targets a note that declared
#                  that alias, since A%5==0)
#       if d%9==0: text "Dangling [[missing_{d}]]."   (never resolves)
#       if d%6==0: media span, media_ref = 'assets/img_{d%10}.png'
#     SHADOW note when d%10==0, key = 'extra/note_{d}':
#       single text span "Shadow body."  (stem collides with note_{d};
#       'extra/note_{d}' < 'note_{d}' lexicographically, so first-wins
#       short-name resolution — min order_key — picks the shadow)
#
#   Short-name resolution of 'note_X' therefore canonicalizes to
#   'extra/note_X' when X%10==0, else 'note_X'.
# ---------------------------------------------------------------------------


def derive_vault_batch(batch: pa.Table, n_docs: int) -> pa.Table:
    """Vault-derivation map_batches kernel (documents rows → span rows)."""
    ds_ids = batch["doc_id"].to_pylist()
    langs = batch["lang"].to_pylist()
    rows: list[tuple[str, list[dict]]] = []
    n5 = max(1, n_docs // 5)
    for d, lang in zip(ds_ids, langs):
        fm = f"id: {d}\ntags:\n- {lang}"
        if d % 13 == 0:
            fm += "\n- todo"
        if d % 5 == 0:
            fm += f"\naliases:\n- alias_{d}"
        l1 = (7 * d + 3) % n_docs
        spans = [
            make_span("frontmatter", fm, offset=0),
            make_span(
                "text",
                f"Body {d} has words. See [[note_{l1}]] and again "
                f"[[note_{l1}|alias text]]. #tag_{d % 7} inline.",
                offset=1,
            ),
        ]
        off = 2
        if d % 4 == 0:
            l2 = (3 * d + 1) % n_docs
            spans.append(make_span("text", f"Embed here ![[note_{l2}]] ok.", offset=off))
            off += 1
        if d % 5 == 1:
            a = 5 * (d % n5)
            spans.append(make_span("text", f"Alias link [[alias_{a}]] end.", offset=off))
            off += 1
        if d % 9 == 0:
            spans.append(make_span("text", f"Dangling [[missing_{d}]].", offset=off))
            off += 1
        if d % 6 == 0:
            spans.append(
                make_span("media", media_ref=f"assets/img_{d % 10}.png", offset=off)
            )
            off += 1
        rows.append((f"note_{d}", spans))
        if d % 10 == 0:
            rows.append((f"extra/note_{d}", [make_span("text", "Shadow body.")]))
    return spans_table(rows)


def synth_vault(sf_dir: str, *, override_num_blocks: int | None = None):
    """Vault Dataset derived from ``{sf_dir}/documents.parquet``.

    The derivation itself is a streaming Ray stage (``map_batches``
    over the pruned 2-column read) — at 100 TB the vault never
    materializes on the driver.
    """
    import ray.data as rd

    path = f"{sf_dir}/documents.parquet"
    n_docs = _parquet_num_rows(path)
    kwargs = {}
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks
    docs = rd.read_parquet(path, columns=["doc_id", "lang"], **kwargs)
    return docs.map_batches(
        derive_vault_batch,
        fn_kwargs={"n_docs": n_docs},
        batch_format="pyarrow",
    )


def _parquet_num_rows(path: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


def oracle_cte(sf_dir_table: str = "documents") -> str:
    """Shared DuckDB WITH-clause computing the EXPECTED vault facts.

    Mirrors the spec above analytically (no markdown parsing in SQL) so
    the driver can verify the Ray pipeline's parsing + linking +
    canonicalization end to end.  Exposes CTEs:

    * ``m``        — documents with derived ints (d, lang, l1, l2, a)
    * ``exp_mentions`` — one row per extracted mention (kind, subj, obj)
    * ``exp_triples``  — canonical (subj, pred, obj, weight)
    * ``exp_notes``    — per-note (doc_key, note_name, content, n_tags,
      n_aliases, is_todo)
    """
    return f"""
WITH meta AS (SELECT count(*)::BIGINT AS n FROM {sf_dir_table}),
m AS (
  SELECT d.doc_id AS d, d.lang AS lang, meta.n AS n,
         (7*d.doc_id+3) % meta.n AS l1,
         (3*d.doc_id+1) % meta.n AS l2,
         5*(d.doc_id % (CASE WHEN meta.n>=5 THEN meta.n//5 ELSE 1 END)) AS a
  FROM {sf_dir_table} d, meta
),
resolved AS (
  SELECT *,
    CASE WHEN l1 % 10 = 0 THEN 'extra/note_'||l1 ELSE 'note_'||l1 END AS r1,
    CASE WHEN l2 % 10 = 0 THEN 'extra/note_'||l2 ELSE 'note_'||l2 END AS r2
  FROM m
),
exp_mentions AS (
  SELECT 'link' AS kind, 'note_'||d AS subj, r1 AS obj FROM resolved
  UNION ALL SELECT 'link', 'note_'||d, r1 FROM resolved
  UNION ALL SELECT 'link', 'note_'||d, 'note_'||a FROM resolved WHERE d % 5 = 1
  UNION ALL SELECT 'embed', 'note_'||d, r2 FROM resolved WHERE d % 4 = 0
  UNION ALL SELECT 'media', 'note_'||d, 'assets/img_'||(d % 10)||'.png'
    FROM resolved WHERE d % 6 = 0
  UNION ALL SELECT 'tag', 'note_'||d, lang FROM resolved
  UNION ALL SELECT 'tag', 'note_'||d, 'todo' FROM resolved WHERE d % 13 = 0
  UNION ALL SELECT 'tag', 'note_'||d, 'tag_'||(d % 7) FROM resolved
),
exp_triples AS (
  SELECT subj,
         CASE kind WHEN 'link' THEN 'links_to'
                   WHEN 'embed' THEN 'embeds'
                   WHEN 'media' THEN 'embeds'
                   ELSE 'tagged' END AS pred,
         obj, count(*)::BIGINT AS weight
  FROM exp_mentions GROUP BY 1, 2, 3
  UNION ALL
  SELECT 'extra/note_'||d, 'child_of', 'extra', 1::BIGINT
  FROM m WHERE d % 10 = 0
),
note_content AS (
  SELECT 'note_'||d AS doc_key, 'note_'||d AS note_name,
    'Body '||d||' has words. See [[note_'||l1||']] and again [[note_'||l1||
    '|alias text]]. #tag_'||(d % 7)||' inline.'
    || CASE WHEN d % 4 = 0 THEN chr(10)||'Embed here ![[note_'||l2||']] ok.' ELSE '' END
    || CASE WHEN d % 5 = 1 THEN chr(10)||'Alias link [[alias_'||a||']] end.' ELSE '' END
    || CASE WHEN d % 9 = 0 THEN chr(10)||'Dangling [[missing_'||d||']].' ELSE '' END
    AS content,
    (2 + CASE WHEN d % 13 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_tags,
    (CASE WHEN d % 5 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_aliases,
    d % 13 = 0 AS is_todo
  FROM m
  UNION ALL
  SELECT 'extra/note_'||d, 'note_'||d, 'Shadow body.', 0::BIGINT, 0::BIGINT, FALSE
  FROM m WHERE d % 10 = 0
),
exp_notes AS (
  SELECT doc_key, note_name, content,
         array_length(regexp_split_to_array(content, '\\s+'))::BIGINT AS n_words,
         strlen(content)::BIGINT AS n_bytes,
         md5(content) AS content_hash,
         n_tags, n_aliases, is_todo
  FROM note_content
)
""".strip()


# ---------------------------------------------------------------------------
# 2. Reference-bench-shaped corpus (benchmarks.rs:15-70), seeded + parallel.
# ---------------------------------------------------------------------------

_FILLER_WORDS = (
    "graph vault note link index span batch arrow shuffle actor "
    "stream block parquet lance ray data schema column row table"
).split()


def gen_bench_batch(batch: pa.Table, n_docs: int, links_per_doc: int, seed: int) -> pa.Table:
    """Per-doc seeded generator → deterministic regardless of block split."""
    rows = []
    for i in batch["id"].to_pylist():
        rng = np.random.RandomState((seed * 1_000_003 + i) % (2**31 - 1))
        parts = []
        for _ in range(links_per_doc):
            n_lines = int(rng.randint(50, 101))
            words = rng.choice(len(_FILLER_WORDS), size=n_lines * 6)
            lines = [
                " ".join(_FILLER_WORDS[w] for w in words[j * 6 : (j + 1) * 6])
                for j in range(n_lines)
            ]
            lines.append(f"Link [[note_{int(rng.randint(0, n_docs))}]]")
            parts.append("\n".join(lines))
        spans = [
            make_span("frontmatter", f"id: {i}", offset=0),
            make_span("text", "\n".join(parts), offset=1),
        ]
        rows.append((f"note_{i}", spans))
    return spans_table(rows)


def bench_corpus(n_docs: int, *, links_per_doc: int = 10, seed: int = 42,
                 override_num_blocks: int | None = None):
    """Fixture-7 corpus as a streaming Dataset (never driver-materialized)."""
    import ray.data as rd

    kwargs = {}
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks
    return rd.range(n_docs, **kwargs).map_batches(
        gen_bench_batch,
        fn_kwargs={"n_docs": n_docs, "links_per_doc": links_per_doc, "seed": seed},
        batch_format="pyarrow",
    )
