"""Incremental graph maintenance == full rebuild, across delta shapes:
content-only change, short-name theft, alias theft, add, remove, and
successive deltas (tombstone generations)."""

from __future__ import annotations

import shutil
import tempfile

import pytest


def _triples_set(ds):
    return sorted(
        (r["subj"], r["pred"], r["obj"], r["weight"])
        for r in ds.take_all()
    )


def _full(vault: dict):
    from obsidian_parser_ray.pipelines.graph import build_graph
    from obsidian_parser_ray.sources import from_markdown_items

    g = build_graph(
        from_markdown_items(sorted(vault.items())),
        materialize_notes=True,
    )
    return _triples_set(g.triples)


def _apply(vault: dict, delta: list, removed: list) -> dict:
    v = dict(vault)
    for d, raw in delta:
        v[d] = raw
    for d in removed:
        v.pop(d, None)
    return v


V0 = {
    "notes/a": "Link to [[b]] and [[missing]]. #t1",
    "notes/b": "---\naliases: [bee]\n---\nBody [[c]].",
    "notes/c": "See [[bee]] and [[notes/a]].",
    "notes/d": "Cites [[c]] too.",
    "zz/c": "Shadow short-name c loses to notes/c.",
}


@pytest.mark.usefixtures("ray_session")
class TestIncremental:
    def _base(self, vault: dict, tmp: str):
        from obsidian_parser_ray.pipelines.incremental import (
            checkpoint_graph_base,
        )
        from obsidian_parser_ray.sources import from_markdown_items

        checkpoint_graph_base(
            from_markdown_items(sorted(vault.items())), tmp, num_buckets=8
        )

    def _update(self, tmp: str, delta: list, removed: list):
        from obsidian_parser_ray.pipelines.incremental import (
            incremental_update,
        )
        from obsidian_parser_ray.sources import from_markdown_items

        return _triples_set(
            incremental_update(
                tmp, from_markdown_items(delta), removed
            )
        )

    def _roundtrip(self, deltas_and_removals: list[tuple[list, list]]):
        tmp = tempfile.mkdtemp(prefix="kginc_")
        try:
            self._base(V0, tmp)
            vault = V0
            for delta, removed in deltas_and_removals:
                got = self._update(tmp, delta, removed)
                vault = _apply(vault, delta, removed)
                assert got == _full(vault)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    def test_content_only_change(self):
        # no name/alias changes: only notes/a's own triples move
        self._roundtrip(
            [([("notes/a", "Now links [[c]] twice: [[c]]. #t9")], [])]
        )

    def test_alias_theft_and_removal(self):
        # aa/thief < notes/b steals alias 'bee' → notes/c re-resolves
        self._roundtrip([
            ([("aa/thief", "---\naliases: [bee]\n---\nSteals bee.")], []),
            # removing the thief must REVERT the alias to notes/b
            # (runner-up promotion — winner-only state couldn't do this)
            ([], ["aa/thief"]),
        ])

    def test_short_name_theft(self):
        # 'aa/c' < 'notes/c' wins short name 'c' → notes/b and notes/d
        # (citing [[c]]) re-resolve to the new winner
        self._roundtrip(
            [([("aa/c", "New earliest-keyed c.")], [])]
        )

    def test_remove_cited_doc(self):
        # removing notes/c drops short 'c' to the shadow zz/c — citing
        # docs re-resolve to the promoted runner-up
        self._roundtrip([([], ["notes/c"])])

    def test_mixed_successive_deltas(self):
        self._roundtrip([
            (
                [("notes/a", "Rewritten: [[c]] only. #t2"),
                 ("aa/thief", "---\naliases: [bee]\n---\nSteals bee.")],
                ["notes/d"],
            ),
            (
                [("notes/e", "Late joiner cites [[bee]] and [[a]].")],
                ["zz/c"],
            ),
        ])

    def test_empty_delta_is_noop(self):
        tmp = tempfile.mkdtemp(prefix="kginc_")
        try:
            self._base(V0, tmp)
            got = self._update(tmp, [], [])
            assert got == _full(V0)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    def test_compaction_preserves_reads_and_shrinks_map(self):
        """VERDICT r2 #8: compact_mention_keys must (a) clear the
        tombstone map, (b) leave the tombstone-FILTERED read of the
        reverse index identical to the plain read of the compacted
        one, (c) physically drop stale generations, and (d) leave
        later incremental updates producing the same triples as an
        uncompacted twin."""
        import json
        import os

        from obsidian_parser_ray.pipelines.incremental import (
            _MKEYS_SCHEMA,
            _all_bucket_ids,
            _bucket_dirs,
            _read_dirs,
            _tombstone_filter,
            compact_mention_keys,
        )

        tmp = tempfile.mkdtemp(prefix="kginc_")
        twin = tempfile.mkdtemp(prefix="kginc_twin_")
        try:
            self._base(V0, tmp)
            # two deltas → tombstones at two generations
            d1 = [("notes/a", "Now links [[c]] twice: [[c]]. #t9")]
            d2 = [("aa/thief", "---\naliases: [bee]\n---\nSteals bee.")]
            self._update(tmp, d1, [])
            self._update(tmp, d2, [])

            mk_root = os.path.join(tmp, "mention_keys")

            def read_mk(filtered_by: dict | None):
                ds = _read_dirs(
                    _bucket_dirs(mk_root, "kb",
                                 _all_bucket_ids(mk_root, "kb")),
                    _MKEYS_SCHEMA,
                )
                if filtered_by:
                    ds = ds.map_batches(_tombstone_filter(filtered_by),
                                        batch_format="pyarrow")
                return sorted(
                    (r["target_key"], r["doc_id"], r["gen"])
                    for r in ds.take_all()
                )

            with open(os.path.join(tmp, "_MANIFEST.json")) as f:
                man_pre = json.load(f)
            assert man_pre["tombstones"]  # something to compact
            raw_pre = read_mk(None)
            filt_pre = read_mk(man_pre["tombstones"])
            assert len(raw_pre) > len(filt_pre)  # stale rows exist

            shutil.copytree(tmp, twin, dirs_exist_ok=True)
            man_post = compact_mention_keys(tmp)
            assert man_post["tombstones"] == {}
            with open(os.path.join(tmp, "_MANIFEST.json")) as f:
                assert json.load(f)["tombstones"] == {}
            # plain read of compacted == filtered read of uncompacted
            assert read_mk(None) == filt_pre
            # compacting again is a no-op (empty map short-circuits)
            assert compact_mention_keys(tmp)["tombstones"] == {}

            # a further delta behaves identically on both bases
            d3 = [("notes/e", "Cites [[bee]] and [[c]].")]
            got_compacted = self._update(tmp, d3, [])
            got_twin = self._update(twin, d3, [])
            assert got_compacted == got_twin
            vault = _apply(_apply(_apply(V0, d1, []), d2, []), d3, [])
            assert got_compacted == _full(vault)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
            shutil.rmtree(twin, ignore_errors=True)
