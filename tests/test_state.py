"""Checkpoint / resume / lineage manifests (north_rule: resumable runs
with per-partition lineage + metrics)."""

import json
import os

import pytest

from obsidian_parser_ray import build_graph, write_graph
from obsidian_parser_ray.sources import from_markdown_items
from obsidian_parser_ray.state import checkpoint_dataset, load_manifest, manifest_path


def _docs():
    return from_markdown_items(
        [(f"n{i}", f"---\nid: {i}\n---\nBody [[n{(i + 1) % 20}]] #t{i % 3}") for i in range(20)]
    )


class TestCheckpointDataset:
    def test_checkpoint_and_resume(self, tmp_path, ray_session):
        import ray.data as rd

        ds = rd.range(100).map_batches(lambda b: b, batch_format="pyarrow")
        path = str(tmp_path / "ckpt")
        out1 = checkpoint_dataset(ds, path, lineage="stage_x")
        assert out1.count() == 100
        m = load_manifest(path)
        assert m["rows"] == 100 and m["lineage"] == "stage_x"
        written_at = m["written_at"]

        # resume: same path returns the stored data WITHOUT rewriting
        out2 = checkpoint_dataset(ds, path, lineage="stage_x")
        assert out2.count() == 100
        assert load_manifest(path)["written_at"] == written_at

    def test_half_written_checkpoint_not_trusted(self, tmp_path, ray_session):
        import ray.data as rd

        path = str(tmp_path / "ckpt2")
        # simulate a crash: data dir exists but no manifest
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "part-0.parquet"), "wb") as f:
            f.write(b"garbage")
        ds = rd.range(7)
        out = checkpoint_dataset(ds, path, lineage="y")
        assert out.count() == 7  # recomputed, garbage replaced
        assert load_manifest(path)["rows"] == 7


class TestGraphCheckpoint:
    def test_build_graph_resumes_from_notes_checkpoint(self, tmp_path, ray_session):
        ck = str(tmp_path / "graph_ck")
        g1 = build_graph(_docs(), checkpoint_dir=ck)
        t1 = {
            (r["subj"], r["pred"], r["obj"]): r["weight"]
            for r in g1.triples.take_all()
        }
        stamp = load_manifest(ck + "/notes")["written_at"]

        g2 = build_graph(_docs(), checkpoint_dir=ck)
        t2 = {
            (r["subj"], r["pred"], r["obj"]): r["weight"]
            for r in g2.triples.take_all()
        }
        assert t1 == t2
        # the notes stage was NOT recomputed on the resumed run
        assert load_manifest(ck + "/notes")["written_at"] == stamp


class TestWriteGraph:
    def test_partitioned_output_with_manifests(self, tmp_path, ray_session):
        out = str(tmp_path / "kg_out")
        g = build_graph(_docs())
        m = write_graph(g, out)
        assert m["triples"]["rows"] > 0
        assert m["nodes"]["rows"] == 20
        for sub in ("triples", "nodes"):
            assert os.path.exists(manifest_path(f"{out}/{sub}"))
            files = json.load(open(manifest_path(f"{out}/{sub}")))["files"]
            assert files and all(f.endswith(".parquet") for f in files)
        # rerun: resumable — manifests untouched
        stamp = m["triples"]["written_at"]
        m2 = write_graph(build_graph(_docs()), out)
        assert m2["triples"]["written_at"] == stamp

    def test_dataset_id_invalidates_stale_output(self, tmp_path, ray_session):
        """An input fingerprint in dataset_id must force a rewrite over
        the same out_dir — the stale-manifest escape hatch ADVICE asked
        for (lineage alone would silently serve the old data)."""
        out = str(tmp_path / "kg_fp")
        m1 = write_graph(build_graph(_docs()), out, dataset_id="corpus-v1")
        stamp = m1["triples"]["written_at"]
        # same dataset_id → resume (no rewrite)
        m2 = write_graph(build_graph(_docs()), out, dataset_id="corpus-v1")
        assert m2["triples"]["written_at"] == stamp
        # different dataset_id → rewrite
        m3 = write_graph(build_graph(_docs()), out, dataset_id="corpus-v2")
        assert m3["triples"]["written_at"] != stamp
