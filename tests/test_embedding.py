"""Pluggable embedding-inference stage: default feature-hash model
parity with hashed_doc_vectors, custom model plumbing, contract
validation, normalization."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from obsidian_parser_ray.stages.embedding import (
    embed_documents,
    feature_hash_model,
)


def _docs():
    return pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "alpha beta gamma alpha",
            "beta delta",
            "",                      # zero vector
            "Alpha ALPHA alpha",     # case folding
        ]),
    })


@pytest.mark.usefixtures("ray_session")
class TestEmbedDocuments:
    def test_default_model_matches_sparse_hash_vectors(self):
        """Dense embed_documents output must equal the dense assembly
        of hashed_doc_vectors' long-form rows (identical md5
        bucket/sign derivation)."""
        from obsidian_parser_ray.stages.text import hashed_doc_vectors

        ds = rd.from_arrow(_docs()).repartition(2)
        dense = {
            r["doc_id"]: np.asarray(r["embedding"])
            for r in embed_documents(ds, dim=64).take_all()
        }
        sparse = hashed_doc_vectors(ds, dim=64).take_all()
        rebuilt = {i: np.zeros(64) for i in dense}
        for r in sparse:
            rebuilt[r["doc_id"]][r["dim_idx"]] = r["value"]
        for i in dense:
            assert np.array_equal(dense[i], rebuilt[i]), i
        assert not dense[3].any()  # empty text → zero vector

    def test_custom_model_factory_loaded_once_per_actor(self):
        """A plug-in model factory must run in the actor (not per
        batch) and its output ride through unchanged."""

        def factory():
            # the closure is the 'model load'; a constant projection
            # makes per-row outputs predictable
            def model_fn(texts):
                return np.array(
                    [[float(len(x)), 1.0] for x in texts]
                )

            return model_fn

        ds = rd.from_arrow(_docs())
        out = {
            r["doc_id"]: list(r["embedding"])
            for r in embed_documents(
                ds, model_factory=factory, dim=2
            ).take_all()
        }
        assert out[2] == [len("beta delta"), 1.0]
        assert out[3] == [0.0, 1.0]

    def test_wrong_shape_raises(self):
        def bad_factory():
            return lambda texts: np.zeros((len(texts), 7))

        ds = rd.from_arrow(_docs())
        with pytest.raises(Exception, match="expected"):
            embed_documents(
                ds, model_factory=bad_factory, dim=64
            ).take_all()

    def test_non_finite_raises(self):
        def nan_factory():
            def model_fn(texts):
                m = np.zeros((len(texts), 4))
                m[0, 0] = np.nan
                return m

            return model_fn

        ds = rd.from_arrow(_docs())
        with pytest.raises(Exception, match="non-finite"):
            embed_documents(
                ds, model_factory=nan_factory, dim=4
            ).take_all()

    def test_normalize_emits_unit_vectors(self):
        ds = rd.from_arrow(_docs())
        for r in embed_documents(ds, dim=64, normalize=True).take_all():
            n = float(np.linalg.norm(np.asarray(r["embedding"])))
            assert n == 0.0 or abs(n - 1.0) < 1e-12

    def test_feeds_knn_bruteforce(self):
        """The stage's output schema must be directly consumable by
        the similarity operators."""
        from obsidian_parser_ray.stages.similarity import knn_bruteforce

        ds = rd.from_arrow(_docs())
        emb = embed_documents(ds, dim=64).materialize()
        q = [r for r in emb.take_all() if r["doc_id"] == 1]
        res = knn_bruteforce(
            emb, ([1], np.asarray([q[0]["embedding"]])), k=2,
            vec_col="embedding", id_col="doc_id",
        ).take_all()
        got = [(r["neighbor_id"], r["rank"]) for r in res]
        # doc 4 shares the 'alpha' bucket with doc 1; doc 2 shares
        # 'beta' — both rank above the zero-vector doc 3
        assert len(got) == 2
        assert got[0][1] == 1 and got[1][1] == 2
        assert {g[0] for g in got} <= {2, 3, 4}


class TestFeatureHashModel:
    def test_deterministic_and_signed(self):
        m = feature_hash_model(16)
        a = m(["alpha beta", "alpha beta"])
        assert np.array_equal(a[0], a[1])
        assert a[0].any()
        # term frequency weighting
        b = m(["alpha", "alpha alpha"])
        assert np.array_equal(b[1], 2 * b[0])
