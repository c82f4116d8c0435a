"""Canonicalization shuffle: edge multiset → canonical triple set.

The reference keeps parallel edges (graph_builder.rs:216-218 adds one
edge per link occurrence); the canonical *set* with multiplicity is
what the north rule scores (SURVEY.md §2.5 A8).  This stage implements
the mandated "groupby-aggregate canonicalization shuffle (salted keys
for hub-note skew)":

1. **Pre-aggregate inside map_batches** — each batch is collapsed with
   an Arrow ``Table.group_by`` before anything ships, so the all-to-all
   exchange moves one row per distinct (subj, pred, obj) per block
   instead of one per occurrence.  This is the salted two-phase
   aggregation in disguise: the implicit salt is the block id, which
   uniformly splits hub keys across the first phase; the second phase
   (the small global groupby) merges per-block partials.
2. **Global groupby** on (subj, pred, obj) summing the partial weights.

Undirected graphs (reference ``get_ungraph``/``EdgeType`` generic,
vault_petgraph/mod.rs:46-49) canonicalize the endpoint pair to
(min, max) before grouping.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

TRIPLES_KEYS = ["subj", "pred", "obj"]


def _combine_batch(batch: pa.Table) -> pa.Table:
    """Per-block partial aggregation (phase 1 of the salted two-phase)."""
    if batch.num_rows == 0:
        return pa.table(
            {
                "subj": pa.array([], pa.string()),
                "pred": pa.array([], pa.string()),
                "obj": pa.array([], pa.string()),
                "weight": pa.array([], pa.int64()),
            }
        )
    if "weight" not in batch.column_names:
        batch = batch.append_column(
            "weight", pa.array([1] * batch.num_rows, pa.int64())
        )
    out = batch.select(TRIPLES_KEYS + ["weight"]).group_by(TRIPLES_KEYS).aggregate(
        [("weight", "sum")]
    )
    return out.rename_columns(TRIPLES_KEYS + ["weight"])


def _undirect_batch(batch: pa.Table) -> pa.Table:
    """Endpoint canonicalization for undirected graphs: subj,obj := minmax."""
    subj, obj = batch["subj"], batch["obj"]
    lo = pc.min_element_wise(subj, obj)
    hi = pc.max_element_wise(subj, obj)
    batch = batch.set_column(batch.schema.get_field_index("subj"), "subj", lo)
    return batch.set_column(batch.schema.get_field_index("obj"), "obj", hi)


def canonicalize(edges, *, directed: bool = True, batch_size: int | None = 8192):
    """edges Dataset → canonical triples Dataset (subj, pred, obj, weight).

    The only all-to-all exchange of the KG pipeline.  Shuffle volume is
    bounded by (distinct triples per block × blocks), not by raw edge
    count, thanks to the per-block combiner.
    """
    from ray.data.aggregate import Sum

    if not directed:
        edges = edges.map_batches(_undirect_batch, batch_format="pyarrow")
    partials = edges.map_batches(
        _combine_batch, batch_format="pyarrow", batch_size=batch_size
    )
    out = partials.groupby(TRIPLES_KEYS).aggregate(
        Sum("weight", alias_name="weight")
    )
    return out


def sorted_triples(triples):
    """Final sorted materialize order (north_star): (subj, pred, obj)."""
    return triples.sort(TRIPLES_KEYS)


def degree_top_k(triples, *, pred: str = "links_to", by: str = "obj", k: int = 10):
    """Hub notes: top-k endpoints by summed weight (SURVEY.md §2.5 A6).

    ``by='obj'`` = most-linked-to (in-degree), ``by='subj'`` =
    out-degree.  Deterministic tie-break on the key string.
    """
    from ray.data.aggregate import Sum

    deg = (
        triples.filter(expr=f"pred == '{pred}'")
        .groupby(by)
        .aggregate(Sum("weight", alias_name="degree"))
    )
    return deg.sort(["degree", by], descending=[True, False]).limit(k)
