"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init``/``ray.shutdown`` here or in the library.

The knowledge-graph queries run over an interleaved-span vault
(BASELINE.json ``input_hint`` schema) synthesized deterministically
from the sf dir's ``documents`` table by
:func:`obsidian_parser_ray.corpus.derive_vault_batch` — a derivation
simple enough that the expected triples/notes are analytically
computable in SQL (:func:`obsidian_parser_ray.corpus.oracle_cte`)
while the Ray side does the real work: markdown/frontmatter parsing,
wikilink+tag extraction, broadcast-dictionary entity linking, and the
canonicalization groupby shuffle.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

_GRAPH_CACHE: dict[str, Any] = {}


def _graph(sf_dir: str):
    """Build (once per sf_dir) the full KG pipeline result."""
    if sf_dir not in _GRAPH_CACHE:
        from obsidian_parser_ray import build_graph, synth_vault

        _GRAPH_CACHE[sf_dir] = build_graph(
            synth_vault(sf_dir), linker_concurrency=2
        )
    return _GRAPH_CACHE[sf_dir]


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: vault → canonical
    triples (sorted materialize)."""
    from obsidian_parser_ray.stages.canonicalize import sorted_triples

    g = _graph("/root/testdata/sf0.001")
    return sorted_triples(g.triples)


# --- Ray-side query callables ------------------------------------------------


def _q_kg_triples(sf_dir: str):
    return _graph(sf_dir).triples


def _q_kg_nodes(sf_dir: str):
    import pyarrow as pa
    import pyarrow.compute as pc

    notes = _graph(sf_dir).notes

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "note_name": t["note_name"],
                "n_words": t["n_words"],
                "n_bytes": t["n_bytes"],
                "content_hash": t["content_hash"],
                "n_tags": pc.cast(pc.list_value_length(t["tags"]), pa.int64()),
                "n_aliases": pc.cast(pc.list_value_length(t["aliases"]), pa.int64()),
                "is_todo": t["is_todo"],
            }
        )

    return notes.map_batches(project, batch_format="pyarrow")


def _q_kg_mentions(sf_dir: str):
    from ray.data.aggregate import Count

    m = _graph(sf_dir).mentions
    return m.groupby("kind").aggregate(Count(alias_name="n"))


def _q_kg_degree(sf_dir: str):
    return _graph(sf_dir).top_hubs(k=10, pred="links_to", by="obj")


def _q_kg_dup_name(sf_dir: str):
    from obsidian_parser_ray.pipelines.graph import duplicates_by_name

    return duplicates_by_name(_graph(sf_dir).notes)


def _q_kg_dup_content(sf_dir: str):
    from obsidian_parser_ray.pipelines.graph import duplicates_by_content

    return duplicates_by_content(_graph(sf_dir).notes)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "kg_triples": _q_kg_triples,
        "kg_nodes": _q_kg_nodes,
        "kg_mentions": _q_kg_mentions,
        "kg_degree": _q_kg_degree,
        "kg_dup_name": _q_kg_dup_name,
        "kg_dup_content": _q_kg_dup_content,
    }


def oracle_sql() -> dict[str, str]:
    from obsidian_parser_ray.corpus import oracle_cte

    cte = oracle_cte("documents")
    return {
        "kg_triples": cte + "\nSELECT subj, pred, obj, weight FROM exp_triples",
        "kg_nodes": cte
        + "\nSELECT doc_key AS doc_id, note_name, n_words, n_bytes,"
        " content_hash, n_tags, n_aliases, is_todo FROM exp_notes",
        "kg_mentions": cte
        + """
SELECT 'link' AS kind,
       (2*count(*)
        + sum(CASE WHEN d % 5 = 1 THEN 1 ELSE 0 END)
        + sum(CASE WHEN d % 9 = 0 THEN 1 ELSE 0 END))::BIGINT AS n FROM m
UNION ALL SELECT 'embed', sum(CASE WHEN d % 4 = 0 THEN 1 ELSE 0 END)::BIGINT FROM m
UNION ALL SELECT 'media', sum(CASE WHEN d % 6 = 0 THEN 1 ELSE 0 END)::BIGINT FROM m
UNION ALL SELECT 'tag_frontmatter',
       (count(*) + sum(CASE WHEN d % 13 = 0 THEN 1 ELSE 0 END))::BIGINT FROM m
UNION ALL SELECT 'tag_inline', count(*)::BIGINT FROM m
""",
        "kg_degree": cte
        + "\nSELECT obj, sum(weight)::BIGINT AS degree FROM exp_triples"
        " WHERE pred = 'links_to' GROUP BY obj"
        " ORDER BY degree DESC, obj LIMIT 10",
        "kg_dup_name": cte
        + "\nSELECT note_name, count(*)::BIGINT AS n_docs, min(doc_key) AS keeper"
        " FROM exp_notes GROUP BY note_name HAVING count(*) > 1",
        "kg_dup_content": cte
        + "\nSELECT content_hash, count(*)::BIGINT AS n_docs, min(doc_key) AS keeper"
        " FROM exp_notes GROUP BY content_hash HAVING count(*) > 1",
    }
