"""Composed training-data prep pipeline."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

from obsidian_parser_ray.pipelines.prepare import prepare_training_corpus


def _docs():
    good = "the cat is on the mat and it is flat. " * 10  # quality: high
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "text": pa.array(
                    [good, good, "x", good + "unique tail", "der hund und die katze ist nicht ein " * 8],
                    pa.string(),
                ),
                "lang": pa.array(["en", "en", "en", "fr", "de"], pa.string()),
            }
        )
    )


def test_prepare_filters_dedups_chunks(ray_session):
    out = prepare_training_corpus(
        _docs(), min_quality_micro=500000, langs=("en", "de"), window=50,
        overlap=10,
    ).to_pandas()
    # doc 3 fails quality (single word), doc 4 is fr (lang filter),
    # doc 2 is an exact dup of doc 1 (min id kept)
    assert set(out["doc_id"]) == {1, 5}
    # chunking actually splits doc 1 (90 words, window 50, stride 40)
    assert len(out[out["doc_id"] == 1]) > 1
    assert (out["n_tokens"] > 0).all()


def test_prepare_no_filters_keeps_all_nonempty(ray_session):
    out = prepare_training_corpus(_docs(), window=1000).to_pandas()
    assert set(out["doc_id"]) == {1, 3, 4, 5}  # only the dup dropped
