"""Composed training-data preparation pipeline.

The end-to-end shape an LLM-corpus job actually runs, chained from the
individually-oracled stages so the WHOLE composition stays
hash-checkable by the driver: quality scoring → quality + language
filter → exact dedup (keep min id per text) → word-window chunking.
Every stage is a streaming Dataset transform; the only exchange is the
dedup's bounded hash partition.  At 100 TB each stage keeps its own
knobs (dedup ``num_partitions``, chunker window) — nothing here
materializes or funnels through the driver.

MinHash near-dup removal slots between dedup and chunking in
production (``stages.dedup.minhash_lsh_pairs`` → drop ``id_b``); it is
excluded from this oracle-checked composition because LSH recall is
probabilistic (covered by its own gate query instead).
"""

from __future__ import annotations


def prepare_training_corpus(docs, *, min_quality_micro: int = 0,
                            langs: tuple | None = None,
                            lang_col: str = "lang",
                            window: int = 200, overlap: int = 50,
                            num_partitions: int = 64,
                            strip_ngram: int | None = None,
                            strip_min_docs: int = 2):
    """documents (doc_id, text[, lang]) → chunk Dataset
    ``(doc_id, chunk_idx, chunk_text, n_tokens)``.

    ``min_quality_micro`` filters on the integer micro quality score
    (exact cross-engine arithmetic — see ``text.quality_score_batch``);
    ``langs`` keeps only the listed language codes (column equality,
    not detection — use ``text.lang_id`` upstream when the corpus has
    no trusted lang column).

    ``strip_ngram`` (optional) prepends cross-document
    repeated-substring removal (``dedup.remove_repeated_ngrams``):
    spans inside any ``strip_ngram``-gram shared by
    ``strip_min_docs``+ docs are excised BEFORE quality scoring — so
    boilerplate can no longer prop up (or drag down) a document's
    quality, and downstream exact dedup sees normalized text.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.chunking import chunk_documents
    from ..stages.dedup import drop_exact_duplicates
    from ..stages.text import quality_score_batch

    if strip_ngram is not None:
        from ..stages.dedup import remove_repeated_ngrams
        from ..stages.joins import hash_join_unique

        cleaned = remove_repeated_ngrams(
            docs, n=strip_ngram, min_docs=strip_min_docs,
            num_partitions=num_partitions,
        )

        def as_text(t: pa.Table) -> pa.Table:
            return pa.table(
                {"doc_id": t["doc_id"], "text": t["clean_text"]}
            )

        left = cleaned.map_batches(as_text, batch_format="pyarrow")
        if langs is not None:
            # re-attach the language column (unique per doc_id)
            docs = hash_join_unique(
                left, docs.select_columns(["doc_id", lang_col]),
                left_key="doc_id", num_partitions=num_partitions,
            )
        else:
            docs = left

    scored = docs.map_batches(
        quality_score_batch, batch_format="pyarrow", batch_size=512
    )

    def keep(t: pa.Table) -> pa.Table:
        mask = pc.greater_equal(
            t["quality_micro"], pa.scalar(min_quality_micro, pa.int64())
        )
        if langs is not None:
            mask = pc.and_(
                mask,
                pc.is_in(
                    t[lang_col],
                    value_set=pa.array(list(langs), pa.string()),
                ),
            )
        return t.filter(mask).select(["doc_id", "text"])

    filtered = scored.map_batches(keep, batch_format="pyarrow")
    kept = drop_exact_duplicates(filtered, num_partitions=num_partitions)
    return chunk_documents(
        kept.select_columns(["doc_id", "text"]), window=window,
        overlap=overlap,
    )
