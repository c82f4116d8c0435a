"""Entity linking: mentions → resolved edges via a broadcast dictionary.

Re-expresses the reference's two-phase graph build
(/root/reference/src/vault/vault_petgraph/graph_builder.rs:88-223):

* Phase A (index build, graph_builder.rs:88-114) becomes
  :func:`build_dictionary` — a streaming pass over the tiny projection
  ``(doc_id, note_name, aliases)`` of the notes table that folds the
  three lookup maps with **first-wins = min(order_key)** semantics
  (index.rs:13 ``or_insert`` under walkdir order → deterministic
  ``min`` in our engine, SURVEY.md §1.4).
* Phase B (edge build, graph_builder.rs:196-223) becomes
  :class:`EntityLinker` — an actor-pool ``map_batches`` stage.  The
  dictionary is ``ray.put`` ONCE on the driver and deserialized ONCE
  per actor in ``__init__`` (never re-shipped per batch).  The
  reference's single consumer-thread graph mutator disappears: edges
  are just Dataset rows.

Resolution rule (index.rs:21-27 + alias extension required by
BASELINE.json north_star): a key containing ``/`` is looked up in the
full-path map only; otherwise the short-name (stem) map, then — our
extension — the alias map.  A miss drops the mention
(graph_builder.rs:213-215 ``filter_map`` inner-join semantics); we
carry it as ``resolved=false`` so callers can keep unresolved metrics.

Scale: the dictionary is the *small side* of the join — broadcast is
correct for ≲10^8 notes (a few GB).  Beyond that, switch to the
documented shuffle-join fallback (SURVEY.md §2.4 J1): hash-partition
mentions and dictionary on ``target_key`` and join per bucket.
"""

from __future__ import annotations

import pyarrow as pa

PRED_FOR_KIND = {
    "link": "links_to",
    "embed": "embeds",
    "media": "embeds",
    "tag_inline": "tagged",
    "tag_frontmatter": "tagged",
}

# kinds whose target is used verbatim (no dictionary lookup)
_LITERAL_KINDS = {"media", "tag_inline", "tag_frontmatter"}


class LinkDictionary:
    """The three first-wins lookup maps (full / short / alias)."""

    __slots__ = ("full", "short", "alias")

    def __init__(self):
        self.full: set[str] = set()
        self.short: dict[str, str] = {}
        self.alias: dict[str, str] = {}

    def fold_batch(self, doc_ids, names, aliases_col) -> None:
        """Fold one (doc_id, note_name, aliases) batch. min() keeps the
        lexicographically-smallest order_key (= doc_id) per key, which
        is order-independent → safe under unordered block arrival."""
        for doc_id, name, aliases in zip(doc_ids, names, aliases_col):
            self.full.add(doc_id)
            prev = self.short.get(name)
            if prev is None or doc_id < prev:
                self.short[name] = doc_id
            for a in aliases or ():
                prev = self.alias.get(a)
                if prev is None or doc_id < prev:
                    self.alias[a] = doc_id

    def resolve(self, key: str) -> str | None:
        """index.rs:21-27 + alias fallback."""
        if "/" in key:
            return key if key in self.full else None
        hit = self.short.get(key)
        if hit is not None:
            return hit
        return self.alias.get(key)

    def __len__(self) -> int:
        return len(self.full) + len(self.short) + len(self.alias)


def build_dictionary(notes) -> LinkDictionary:
    """Streaming driver-side fold over the 3 small columns.

    Only ``(doc_id, note_name, aliases)`` leave the cluster — at 10^12
    docs this becomes the shuffle-join fallback instead (see module
    docstring); at benchmark scale the fold is O(notes) driver work
    over ~40 B/row.
    """
    d = LinkDictionary()
    proj = notes.select_columns(["doc_id", "note_name", "aliases"])
    for batch in proj.iter_batches(batch_size=65536, batch_format="pyarrow"):
        d.fold_batch(
            batch["doc_id"].to_pylist(),
            batch["note_name"].to_pylist(),
            batch["aliases"].to_pylist(),
        )
    return d


EDGES_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("resolved", pa.bool_()),
        ("span_offset", pa.int32()),
        ("occurrence_idx", pa.int32()),
    ]
)


class EntityLinker:
    """Actor-pool linking stage: ``map_batches(EntityLinker, ...)``.

    ``__init__`` runs once per actor (dictionary fetched from the
    object store once); ``__call__`` is a per-batch loop over the
    minimum state — comparable to the reference's per-chunk rayon
    closure (graph_builder.rs:149-166) but with no downstream mutex.
    """

    def __init__(self, dict_ref=None, dictionary: LinkDictionary | None = None):
        if dictionary is not None:
            self.d = dictionary
        else:
            import ray

            self.d = ray.get(dict_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch["kind"].to_pylist()
        targets = batch["target_key"].to_pylist()
        resolve = self.d.resolve
        objs: list[str | None] = []
        resolved_flags: list[bool] = []
        preds: list[str] = []
        for kind, target in zip(kinds, targets):
            preds.append(PRED_FOR_KIND[kind])
            if kind in _LITERAL_KINDS:
                objs.append(target)
                resolved_flags.append(True)
            else:
                hit = resolve(target)
                if hit is None:
                    objs.append(target)
                    resolved_flags.append(False)
                else:
                    objs.append(hit)
                    resolved_flags.append(True)
        return pa.Table.from_arrays(
            [
                batch["subj"].combine_chunks()
                if isinstance(batch["subj"], pa.ChunkedArray)
                else batch["subj"],
                pa.array(preds, pa.string()),
                pa.array(objs, pa.string()),
                pa.array(resolved_flags, pa.bool_()),
                batch["span_offset"].combine_chunks()
                if isinstance(batch["span_offset"], pa.ChunkedArray)
                else batch["span_offset"],
                batch["occurrence_idx"].combine_chunks()
                if isinstance(batch["occurrence_idx"], pa.ChunkedArray)
                else batch["occurrence_idx"],
            ],
            schema=EDGES_SCHEMA,
        )


def link_mentions(mentions, dictionary: LinkDictionary, *,
                  concurrency=(2, 8), batch_size: int | None = 4096,
                  drop_unresolved: bool = True):
    """mentions Dataset → edges Dataset via the actor-pool linker.

    ``drop_unresolved=True`` matches the reference's inner-join
    semantics (unresolvable mentions discarded, graph_builder.rs:214);
    ``False`` keeps them flagged for metrics.
    """
    import pyarrow.compute as pc
    import ray

    ref = ray.put(dictionary)
    edges = mentions.map_batches(
        EntityLinker,
        fn_constructor_kwargs={"dict_ref": ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    if drop_unresolved:
        edges = edges.map_batches(
            lambda t: t.filter(pc.equal(t["resolved"], True)),
            batch_format="pyarrow",
        )
    return edges


def child_of_edges(notes):
    """Derived ``child_of`` triples from path-shaped doc ids
    (SURVEY.md §7.2: ``data/main`` → child_of → ``data``)."""
    import pyarrow.compute as pc

    def derive(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        mask = pc.match_substring(ids, "/")
        subj = ids.filter(mask)
        # parent = everything before the last '/'
        parents = pa.array(
            [s.rsplit("/", 1)[0] for s in subj.to_pylist()], pa.string()
        )
        n = len(subj)
        return pa.Table.from_arrays(
            [
                subj,
                pa.array(["child_of"] * n, pa.string()),
                parents,
                pa.array([True] * n, pa.bool_()),
                pa.nulls(n, pa.int32()),
                pa.nulls(n, pa.int32()),
            ],
            schema=EDGES_SCHEMA,
        )

    return notes.select_columns(["doc_id"]).map_batches(
        derive, batch_format="pyarrow"
    )
