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


class TestPrepJobCli:
    """scripts/prep_job.py end-to-end in a fresh process — the
    document-pipeline operational entry point."""

    def test_cli_roundtrip_with_incremental_index(self, tmp_path):
        import json
        import subprocess
        import sys

        import pyarrow as pa
        import pyarrow.parquet as pq

        docs = pa.table(
            {
                "doc_id": pa.array(list(range(30)), pa.int64()),
                "text": pa.array(
                    [
                        # dup pair (5,6) + shared boilerplate on %3 docs
                        ("common header text row " * 3
                         if i % 3 == 0 else "")
                        + (f"unique body {i} " * 30
                           if i not in (6,) else "unique body 5 " * 30)
                        for i in range(30)
                    ]
                ),
                "lang": pa.array(["en"] * 30),
            }
        )
        inp = str(tmp_path / "docs.parquet")
        pq.write_table(docs, inp)
        out = str(tmp_path / "shards")
        idx = str(tmp_path / "digests")
        cmd = [
            sys.executable, "scripts/prep_job.py", "--input", inp,
            "--output", out, "--digest-index", idx,
            "--strip-ngram", "4", "--langs", "en",
            "--capacity", "256", "--num-shards", "2",
            "--num-partitions", "4",
        ]
        p = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=300, cwd="/root/repo")
        assert p.returncode == 0, p.stderr[-1500:]
        report = json.loads(
            [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
        )
        assert report["stages"]["read"] == 30
        # doc 6 is a text-dup of doc 5 after strip -> dropped
        assert report["stages"]["after_dedup"] < 30
        assert report["stages"]["shards"] == 2
        # docs whose text was ENTIRELY shared n-grams end up empty and
        # produce no chunks, so exported rows can trail the kept-doc
        # count by those empties — but never by more
        assert report["rows_exported"] > 0
        assert report["rows_exported"] >= report["stages"]["after_dedup"] - 2

        # second run over the SAME input: everything already in the
        # digest index -> nothing admitted
        out2 = str(tmp_path / "shards2")
        p2 = subprocess.run(
            [c if c != out else out2 for c in cmd],
            capture_output=True, text=True, timeout=300, cwd="/root/repo",
        )
        assert p2.returncode == 0, p2.stderr[-1500:]
        report2 = json.loads(
            [l for l in p2.stdout.splitlines() if l.startswith("{")][-1]
        )
        assert report2["stages"]["after_dedup"] == 0
