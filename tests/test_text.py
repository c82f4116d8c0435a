"""Text-analysis operators: profiles, quality, language ID, stats."""

from __future__ import annotations

import pandas as pd
import pytest

from obsidian_parser_ray.stages.text import (
    LangId,
    bpe_token_count,
    count_punct,
    count_stopwords,
    lang_id,
    lang_stats,
    quality_score_batch,
    rolling_fingerprint,
    text_profile,
)


def _ds(rows):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame(rows))


class TestKernels:
    def test_counts(self):
        assert count_punct("a, b. c!") == 3
        assert count_stopwords("The cat and the dog", "en") == 3  # the, and, the
        assert bpe_token_count("Hello, world! It's 42") == 7
        assert bpe_token_count("") == 0

    def test_fingerprint_properties(self):
        a = rolling_fingerprint("one two three four five six")
        assert a == rolling_fingerprint("one two three four five six")
        assert a != rolling_fingerprint("one two three four five seven")
        assert rolling_fingerprint("") == 0

    def test_langid_heuristic(self):
        l = LangId()
        assert l.predict("the cat is in the house and it is warm") == "en"
        assert l.predict("der Hund ist nicht mit der Katze") == "de"
        assert l.predict("le chat est dans la maison pour une heure") == "fr"
        assert l.predict("el perro es un animal para la casa") == "es"
        assert l.predict("这是中文文本") == "zh"
        assert l.predict("это русский текст") == "ru"
        assert l.predict("xyzzy qwerty") == "und"
        assert l.predict("") == "und"


@pytest.mark.usefixtures("ray_session")
class TestStages:
    def test_text_profile(self):
        out = (
            text_profile(_ds([{"doc_id": 1, "text": "The cat, and dog! 💩"}]))
            .to_pandas()
            .iloc[0]
        )
        assert out["n_chars"] == 19
        assert out["n_bytes"] == 22  # emoji is 4 bytes
        assert out["n_words"] == 5
        assert out["n_punct"] == 2  # ',' and '!'
        # lowercase split → ['the','cat,','and','dog!','💩'] → the, and
        assert out["n_stop_en"] == 2

    def test_quality_batch(self):
        import pyarrow as pa

        t = pa.table({"text": ["the and of to a in is that it for " * 10, "x!!!!"]})
        out = quality_score_batch(t)
        q = out["quality"].to_pylist()
        assert q[0] > q[1]
        assert all(0 <= v <= 1 for v in q)

    def test_lang_id_stage(self):
        out = lang_id(
            _ds(
                [
                    {"doc_id": 0, "text": "the cat is on the mat and it is flat"},
                    {"doc_id": 1, "text": "der Hund und die Katze mit dem Ball"},
                ]
            )
        ).to_pandas()
        assert dict(zip(out["doc_id"], out["pred_lang"])) == {0: "en", 1: "de"}

    def test_lang_stats(self):
        out = lang_stats(
            _ds(
                [
                    {"lang": "en", "text": "a b c"},
                    {"lang": "en", "text": "d e"},
                    {"lang": "de", "text": "f"},
                ]
            )
        ).to_pandas().set_index("lang")
        assert out.loc["en", "n_docs"] == 2
        assert out.loc["en", "total_words"] == 5
        assert out.loc["de", "total_chars"] == 1


class TestTfidf:
    def test_term_frequencies(self, ray_session):
        from obsidian_parser_ray.stages.text import term_frequencies

        out = term_frequencies(
            _ds([{"doc_id": 7, "text": "Cat cat DOG! cat-dog 42"}])
        ).to_pandas()
        got = dict(zip(out["term"], out["tf"]))
        assert got == {"cat": 3, "dog": 2, "42": 1}
        assert out["doc_id"].unique().tolist() == [7]

    def test_tfidf_ranks_rare_terms_higher(self, ray_session):
        from obsidian_parser_ray.stages.text import tfidf_top_terms

        docs = _ds(
            [
                {"doc_id": 0, "text": "common rare0 common common"},
                {"doc_id": 1, "text": "common rare1"},
                {"doc_id": 2, "text": "common rare2"},
            ]
        )
        out = tfidf_top_terms(docs, 1).to_pandas()
        top = dict(zip(out["doc_id"], out["term"]))
        # 'common' has df=3 (idf=1); each rare term df=1 (idf=3).
        # doc 0: common tf=3 ties rare0 tf=1*3 -> tiebreak term asc
        assert top == {0: "common", 1: "rare1", 2: "rare2"}
        assert (out["rn"] == 1).all()

    def test_tfidf_log_idf_and_k(self, ray_session):
        import numpy as np

        from obsidian_parser_ray.stages.text import tfidf_top_terms

        docs = _ds(
            [
                {"doc_id": 0, "text": "alpha beta beta gamma"},
                {"doc_id": 1, "text": "alpha delta"},
            ]
        )
        out = tfidf_top_terms(docs, 2, idf="log").to_pandas()
        d0 = out[out["doc_id"] == 0].sort_values("rn")
        # alpha: df=2 -> ln(1)=0 score; beta tf=2 df=1 -> 2ln2 top
        assert d0["term"].tolist() == ["beta", "gamma"]
        assert np.isclose(
            d0["score"].iloc[0], 2 * np.log(2.0), atol=1e-12
        )


@pytest.mark.usefixtures("ray_session")
class TestRepetitionProfile:
    def test_planted_repetition(self):
        import pyarrow as pa
        import ray

        from obsidian_parser_ray.stages.text import repetition_profile

        docs = pa.table({
            "doc_id": pa.array(["clean", "boiler", "empty"], pa.string()),
            "text": pa.array([
                "one two three\nfour five six",
                "same line\nsame line\nsame line\nword word word word",
                "",
            ], pa.string()),
        })
        out = {
            r["doc_id"]: r
            for r in repetition_profile(
                ray.data.from_arrow(docs)
            ).take_all()
        }
        assert out["clean"]["dup_line_micro"] == 0
        assert out["clean"]["dup_word_micro"] == 0
        b = out["boiler"]
        assert b["n_lines"] == 4 and b["n_distinct_lines"] == 2
        assert b["dup_line_micro"] == 2 * 1_000_000 // 4
        assert b["n_words"] == 10 and b["n_distinct_words"] == 3
        assert b["dup_word_micro"] == 7 * 1_000_000 // 10
        # "" splits to one empty line, zero words — no div-by-zero
        e = out["empty"]
        assert e["n_lines"] == 1 and e["n_words"] == 0
        assert e["dup_line_micro"] == 0 and e["dup_word_micro"] == 0


class TestRedaction:
    def test_redacts_and_counts(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from obsidian_parser_ray.stages.text import redact_pii

        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "mail a@b.io and c.d+e@f.org ok",
                        "host 192.168.0.1 then 1234567 and 42",
                        "nothing here",
                    ]
                ),
            }
        )
        got = (
            redact_pii(rd.from_arrow(t).repartition(2))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got["clean_text"].tolist() == [
            "mail <EMAIL> and <EMAIL> ok",
            "host <IP> then <NUM> and 42",
            "nothing here",
        ]
        assert got["n_redacted_0"].tolist() == [2, 0, 0]
        assert got["n_redacted_1"].tolist() == [0, 1, 0]
        assert got["n_redacted_2"].tolist() == [0, 1, 0]

    def test_matches_duckdb_re2(self, ray_session):
        """The rewrite chain is byte-identical to DuckDB regexp_replace
        (both RE2) on adversarial boundary cases."""
        import duckdb
        import pyarrow as pa
        import ray.data as rd

        from obsidian_parser_ray.stages.text import (
            DEFAULT_REDACTIONS,
            redact_pii,
        )

        texts = [
            "a@b.c",                       # TLD too short -> kept
            "x@y.co",                      # minimal valid email
            "1.2.3.4.5",                   # ip-ish run with extra octet
            "999.999.999.999",             # not range-checked: redacted
            "12345678@mail.example.com",   # email wins before NUM
            "v1.2.3.4x",                   # \b boundaries
            "0000000",                     # exactly 7 digits
            "123456",                      # 6 digits -> kept
        ]
        t = pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()),
             "text": pa.array(texts)}
        )
        got = (
            redact_pii(rd.from_arrow(t).repartition(3))
            .to_pandas()
            .sort_values("doc_id")["clean_text"]
            .tolist()
        )
        con = duckdb.connect()
        con.register("t", t)
        expr = "text"
        for pat, rep in DEFAULT_REDACTIONS:
            expr = f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"
        exp = [
            r[0]
            for r in con.execute(
                f"SELECT {expr} FROM t ORDER BY doc_id"
            ).fetchall()
        ]
        assert got == exp


@pytest.mark.usefixtures("ray_session")
class TestCharLM:
    def test_scrambled_text_scores_worse(self):
        import numpy as np
        import pyarrow as pa
        import ray
        import ray.data as rd

        from obsidian_parser_ray.stages.text import (
            char_lm_surprisal,
            train_char_lm,
        )

        rng = np.random.RandomState(0)
        base = ("the quick brown fox jumps over the lazy dog and then "
                "reads a long book about language statistics ")
        docs = []
        for i in range(40):
            t = base * (2 + i % 3)
            docs.append((f"d{i:02d}", t))
        # scrambled twins: same chars, order destroyed
        for i in range(40):
            chars = list(docs[i][1])
            rng.shuffle(chars)
            docs.append((f"s{i:02d}", "".join(chars)))
        ds = rd.from_arrow(
            pa.table({"doc_id": pa.array([d[0] for d in docs]),
                      "text": pa.array([d[1] for d in docs])})
        ).repartition(4)

        # model trained on the originals only
        orig = ds.filter(lambda r: r["doc_id"].startswith("d"))
        logp, total = train_char_lm(orig)
        assert total > 0
        ref = ray.put(logp)
        scores = {
            r["doc_id"]: r["surprisal_micro"]
            for r in char_lm_surprisal(ds, ref).take_all()
        }
        worse = sum(
            scores[f"s{i:02d}"] > scores[f"d{i:02d}"] for i in range(40)
        )
        assert worse == 40  # scrambling always hurts on clean text
        # determinism
        scores2 = {
            r["doc_id"]: r["surprisal_micro"]
            for r in char_lm_surprisal(ds, ref).take_all()
        }
        assert scores == scores2

    def test_short_and_empty_docs(self):
        import pyarrow as pa
        import ray
        import ray.data as rd

        from obsidian_parser_ray.stages.text import (
            char_lm_surprisal,
            train_char_lm,
        )

        ds = rd.from_arrow(
            pa.table({"doc_id": pa.array(["a", "b", "c"]),
                      "text": pa.array(["hello world", "hi", ""])})
        )
        logp, _ = train_char_lm(ds)
        ref = ray.put(logp)
        out = {r["doc_id"]: r["surprisal_micro"]
               for r in char_lm_surprisal(ds, ref).take_all()}
        assert out["a"] > 0
        assert out["b"] == 0 and out["c"] == 0  # < 3 bytes → no trigram


@pytest.mark.usefixtures("ray_session")
class TestHashedVectors:
    def test_matches_manual_hashing(self):
        import hashlib

        import pyarrow as pa
        import ray.data as rd

        from obsidian_parser_ray.stages.text import hashed_doc_vectors

        docs = {"a": "x y x", "b": "y z", "c": ""}
        ds = rd.from_arrow(
            pa.table({"doc_id": pa.array(list(docs)),
                      "text": pa.array(list(docs.values()))})
        )
        out = {}
        for r in hashed_doc_vectors(ds, dim=8).take_all():
            out[(r["doc_id"], r["dim_idx"])] = r["value"]

        want: dict = {}
        for d, text in docs.items():
            for w in text.split():
                h = hashlib.md5(w.encode()).hexdigest()
                k = (d, int(h[:8], 16) % 8)
                want[k] = want.get(k, 0) + (1 if int(h[8], 16) % 2 == 0
                                            else -1)
        want = {k: v for k, v in want.items() if v != 0}
        assert out == want
        assert not any(d == "c" for d, _ in out)  # empty doc -> no rows


@pytest.mark.usefixtures("ray_session")
class TestCharPairCounts:
    def test_counts_and_separator(self):
        import pyarrow as pa
        import ray.data as rd

        from obsidian_parser_ray.stages.text import char_pair_counts

        # "abab" -> ab:2, ba:1 ; "ba" -> ba:1 ; no cross-doc "b"+"b"
        ds = rd.from_arrow(
            pa.table({"text": pa.array(["abab", "ba", ""])})
        ).repartition(2)
        out = char_pair_counts(ds, k=10).to_pandas()
        got = dict(zip(out["pair"], out["n"]))
        assert got == {"ab": 2, "ba": 2}
        # deterministic tie-break: equal counts -> lexical order
        assert list(out["pair"]) == ["ab", "ba"]

    def test_matches_substr_oracle(self):
        import duckdb
        import pyarrow as pa
        import ray.data as rd

        from obsidian_parser_ray.stages.text import char_pair_counts

        import numpy as np

        rng = np.random.RandomState(3)
        texts = [
            "".join(rng.choice(list("abcde "), rng.randint(0, 40)))
            for _ in range(120)
        ]
        ds = rd.from_arrow(pa.table({"text": pa.array(texts)}))
        out = char_pair_counts(ds.repartition(5), k=15).to_pandas()
        con = duckdb.connect()
        exp = con.execute(
            """
            WITH pos AS (SELECT text,
                         unnest(range(1, length(text))) AS i
                         FROM documents),
            c AS (SELECT substr(text, i, 2) AS pair,
                         count(*)::BIGINT AS n FROM pos GROUP BY pair)
            SELECT pair, n FROM c ORDER BY n DESC, pair LIMIT 15
            """,
        ).fetchdf() if False else con.execute(
            """
            WITH docs AS (SELECT unnest($1::VARCHAR[]) AS text),
            pos AS (SELECT text, unnest(range(1, length(text))) AS i
                    FROM docs),
            c AS (SELECT substr(text, i, 2) AS pair,
                         count(*)::BIGINT AS n FROM pos GROUP BY pair)
            SELECT pair, n FROM c ORDER BY n DESC, pair LIMIT 15
            """,
            [texts],
        ).fetchdf()
        assert out.reset_index(drop=True).equals(exp)


@pytest.mark.usefixtures("ray_session")
class TestTokenSearch:
    def test_boolean_semantics_and_boundaries(self):
        import pyarrow as pa
        import ray.data as rd

        from obsidian_parser_ray.stages.text import token_search

        t = pa.table({
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "lang": pa.array(["en"] * 5),
            "text": pa.array([
                "hash join wins",          # match
                "Hash and JOIN, upper",    # match (case folded)
                "hash join vector",        # excluded by none_of
                "hashing joins",           # no: substrings, not tokens
                "hash only",               # no: missing 'join'
            ]),
        })
        out = token_search(
            rd.from_arrow(t).repartition(2),
            all_of=("hash", "join"), none_of=("vector",),
        ).to_pandas()
        assert sorted(out["doc_id"]) == [1, 2]

    def test_any_of(self):
        import pyarrow as pa
        import ray.data as rd

        from obsidian_parser_ray.stages.text import token_search

        t = pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "lang": pa.array(["en"] * 3),
            "text": pa.array(["alpha beta", "gamma delta", "epsilon"]),
        })
        out = token_search(
            rd.from_arrow(t), any_of=("beta", "gamma"),
        ).to_pandas()
        assert sorted(out["doc_id"]) == [1, 2]


@pytest.mark.usefixtures("ray_session")
class TestNgramNovelty:
    def test_first_seen_attribution(self):
        import pyarrow as pa
        import ray.data as rd

        from obsidian_parser_ray.stages.text import ngram_novelty

        t = pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([
                "a b c d",        # grams: abc, bcd (both novel)
                "a b c e",        # abc (seen), bce (novel)
                "x",              # < 3 tokens -> no row
            ]),
        })
        out = (
            ngram_novelty(rd.from_arrow(t).repartition(2))
            .to_pandas().set_index("doc_id").sort_index()
        )
        assert list(out.index) == [1, 2]
        assert out.loc[1, "n_grams"] == 2 and out.loc[1, "n_novel"] == 2
        assert out.loc[1, "novelty"] == 1.0
        assert out.loc[2, "n_grams"] == 2 and out.loc[2, "n_novel"] == 1
        assert out.loc[2, "novelty"] == 0.5

    def test_duplicate_grams_within_doc_count_once(self):
        import pyarrow as pa
        import ray.data as rd

        from obsidian_parser_ray.stages.text import ngram_novelty

        t = pa.table({
            "doc_id": pa.array([7], pa.int64()),
            "text": pa.array(["a b c a b c a b c"]),
        })
        out = ngram_novelty(rd.from_arrow(t)).to_pandas()
        # distinct grams: abc, bca, cab
        assert out["n_grams"].iloc[0] == 3
        assert out["n_novel"].iloc[0] == 3

    def test_hash_mode_parity_with_exact_mode(self):
        """hash_grams=True (8-byte siphash keys through the exchange)
        must produce IDENTICAL results to the exact-string default on
        a bench-corpus-shaped input (overlapping template sentences +
        unique tails across many docs and partitions)."""
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from obsidian_parser_ray.stages.text import ngram_novelty

        rng = np.random.RandomState(17)
        vocab = [f"w{i}" for i in range(40)]
        texts = []
        for i in range(120):
            tmpl = "the quick brown fox jumps over the lazy dog"
            tail = " ".join(rng.choice(vocab, rng.randint(0, 12)))
            texts.append((tmpl + " " + tail).strip() if i % 3 else tail)
        t = pa.table({
            "doc_id": pa.array(list(range(120)), pa.int64()),
            "text": pa.array(texts),
        })
        ds = rd.from_arrow(t).repartition(6)
        exact = (
            ngram_novelty(ds)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        hashed = (
            ngram_novelty(ds, hash_grams=True)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        assert exact.equals(hashed)


class TestNoveltyProperty:
    """Invariant sweep: per-doc novel counts must total the corpus's
    distinct-gram count (every gram is novel in exactly one doc), and
    novelty is 1.0 for the smallest doc_id owning each of its grams."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(seed=st.integers(0, 2**16), n_docs=st.integers(1, 12))
    @settings(max_examples=10, deadline=None)
    def test_novel_counts_partition_distinct_grams(
        self, ray_session, seed, n_docs
    ):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from obsidian_parser_ray.stages.text import ngram_novelty

        rng = np.random.default_rng(seed)
        vocab = list("abcdef")
        texts = [
            " ".join(rng.choice(vocab, rng.integers(0, 15)))
            for _ in range(n_docs)
        ]
        t = pa.table({
            "doc_id": pa.array(list(range(n_docs)), pa.int64()),
            "text": pa.array(texts),
        })
        out = ngram_novelty(
            rd.from_arrow(t).repartition(3)
        ).to_pandas()
        if out.empty:
            # all docs < n tokens: schema-less empty (Ray prunes
            # empty blocks) — assert the reference agrees it's empty
            out = out.reindex(columns=["doc_id", "n_grams", "n_novel",
                                       "novelty"])
        all_grams = set()
        per_doc = {}
        for i, txt in enumerate(texts):
            toks = txt.split()
            grams = {
                " ".join(toks[j:j + 3])
                for j in range(len(toks) - 2)
            }
            if grams:
                per_doc[i] = grams
                all_grams |= grams
        assert sorted(out["doc_id"]) == sorted(per_doc)
        assert int(out["n_novel"].sum()) == len(all_grams)
        for r in out.itertuples():
            assert r.n_grams == len(per_doc[r.doc_id])


@pytest.mark.usefixtures("ray_session")
class TestTermIndex:
    def _corpus(self):
        import numpy as np
        import pyarrow as pa

        rng = np.random.RandomState(31)
        vocab = ["hash", "join", "vector", "sort", "scan", "merge"]
        texts = [
            " ".join(rng.choice(vocab, rng.randint(1, 8)))
            for _ in range(80)
        ]
        return pa.table({
            "doc_id": pa.array(list(range(80)), pa.int64()),
            "lang": pa.array(["en"] * 80),
            "text": pa.array(texts),
        })

    def test_search_equals_scan(self, tmp_path):
        import ray.data as rd

        from obsidian_parser_ray.stages.text import (
            build_term_index,
            search_term_index,
            token_search,
        )

        t = self._corpus()
        ds = rd.from_arrow(t).repartition(4)
        idx = str(tmp_path / "tidx")
        man = build_term_index(ds, idx, num_buckets=8)
        assert man["num_buckets"] == 8
        for kwargs in (
            {"all_of": ("hash", "join"), "none_of": ("vector",)},
            {"any_of": ("sort", "scan")},
            {"all_of": ("merge",), "any_of": ("hash", "vector")},
        ):
            got = sorted(
                search_term_index(idx, **kwargs).to_pandas()["doc_id"]
            )
            want = sorted(
                token_search(rd.from_arrow(t), **kwargs)
                .to_pandas()["doc_id"]
            )
            assert got == want, kwargs

    def test_rebuild_replaces_not_appends(self, tmp_path):
        import ray.data as rd

        from obsidian_parser_ray.stages.text import (
            build_term_index,
            search_term_index,
        )

        t = self._corpus()
        idx = str(tmp_path / "tidx2")
        build_term_index(rd.from_arrow(t), idx, num_buckets=4)
        n1 = len(search_term_index(idx, any_of=("hash",)).to_pandas())
        # rebuild over the same corpus must not double postings
        build_term_index(rd.from_arrow(t), idx, num_buckets=4)
        n2 = len(search_term_index(idx, any_of=("hash",)).to_pandas())
        assert n1 == n2 > 0

    def test_empty_query_raises(self, tmp_path):
        import ray.data as rd

        from obsidian_parser_ray.stages.text import (
            build_term_index,
            search_term_index,
        )

        idx = str(tmp_path / "tidx3")
        build_term_index(rd.from_arrow(self._corpus()), idx,
                         num_buckets=4)
        with pytest.raises(ValueError):
            search_term_index(idx)

    def test_pure_negation_query_raises(self, tmp_path):
        import ray.data as rd

        from obsidian_parser_ray.stages.text import (
            build_term_index,
            search_term_index,
        )

        # docs with NO query term never appear in the pruned postings,
        # so a none_of-only query cannot match token_search semantics —
        # it must fail loudly instead of silently returning nothing
        idx = str(tmp_path / "tidx4")
        build_term_index(rd.from_arrow(self._corpus()), idx,
                         num_buckets=4)
        with pytest.raises(ValueError, match="pure-negation"):
            search_term_index(idx, none_of=("vector",))


class TestVectorizedKernelParity:
    """Lock the late-r4 flat-buffer/Arrow kernels to their scalar
    reference formulations — any divergence is a correctness bug, not
    a perf regression."""

    def _adversarial_texts(self):
        return [
            "", " ", "a", "ab", "abc", None,
            "the quick brown fox",
            "unicode: héllo wörld … 中文 привет",
            "\n\n\nlines\nlines\n",
            "punct!!! ... ;;; :::",
            "x" * 5000,
            "the " * 3000,                      # >2000 words
            "\x00embedded\x00nul",              # genuine NULs
            "tab\tand  runs   of space",
        ]

    def test_flat_trigram_codes_match_per_doc_walk(self):
        import numpy as np
        import pyarrow as pa

        from obsidian_parser_ray.stages.text import (
            _byte_trigrams,
            _flat_trigram_codes,
        )

        texts = self._adversarial_texts()
        col = pa.array(texts, pa.string())
        codes, counts = _flat_trigram_codes(col)
        # per-row counts match, and the flat code sequence equals the
        # per-doc walks concatenated in row order (same codes, same
        # order — not just the same multiset)
        want_parts = [_byte_trigrams(x or "") for x in texts]
        assert list(counts) == [len(w) for w in want_parts]
        want = (np.concatenate(want_parts)
                if any(len(w) for w in want_parts)
                else np.empty(0, np.uint32))
        assert codes.dtype == np.uint32
        assert np.array_equal(codes, want.astype(np.uint32))

    def test_quality_scores_bit_equal_scalar_formulation(self):
        import numpy as np
        import pyarrow as pa

        from obsidian_parser_ray.stages.text import (
            ascii_word_count,
            count_punct,
            count_stopwords,
            quality_score_batch,
        )

        texts = [x for x in self._adversarial_texts() if x is not None]
        t = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })
        out = quality_score_batch(t)
        for i, x in enumerate(texts):
            n_words = ascii_word_count(x) or 1
            len_score = (min(1.0, n_words / 50.0)
                         * (1.0 if n_words < 2000 else 0.5))
            punct_ratio = count_punct(x) / max(1, len(x))
            punct_score = 1.0 if punct_ratio < 0.1 else 0.5
            stop_ratio = count_stopwords(x) / n_words
            stop_score = min(1.0, stop_ratio * 5)
            raw = (len_score + punct_score + stop_score) / 3
            assert out["quality"][i].as_py() == round(raw, 6), x[:40]
            assert out["quality_micro"][i].as_py() == int(
                np.floor(raw * 1000000.0)
            ), x[:40]

    def test_langid_batch_matches_scalar_predict(self):
        import numpy as np
        import pyarrow as pa

        from obsidian_parser_ray.stages.text import LangId

        li = LangId()
        fixed = [
            "the quick brown fox and the lazy dog",
            "der und die das ist ein",
            "", "xyzzy plugh qwerty",
            "这是中文 the and of",
            "привет мир the and",
            "这是 привет",                       # CJK beats Cyrillic
            "THE AND OF IS",
            "el la de que y en un the and",
        ]
        rng = np.random.RandomState(11)
        vocab = ["the", "and", "der", "die", "el", "la", "не", "и",
                 "xyz", "of", "que", "en", "un", "ist", "ein", "das"]
        fuzz = [" ".join(rng.choice(vocab, rng.randint(0, 25)))
                for _ in range(200)]
        texts = fixed + fuzz
        t = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })
        got = li(t)["pred_lang"].to_pylist()
        assert got == [li.predict(x) for x in texts]

    def test_char_pair_partial_handles_nuls_and_boundaries(self, ray_session):
        """Flat-buffer pair counting == brute-force per-doc pair
        counting, with genuine NUL bytes excluded (the old NUL-join
        formulation's semantics) and no cross-row pairs."""
        from collections import Counter

        import pyarrow as pa
        import ray.data as rd

        from obsidian_parser_ray.stages.text import char_pair_counts

        texts = ["abab", "b\x00a", "", "a", "ba", "日本", "ab"]
        want = Counter()
        for x in texts:
            bs = x.encode("utf-8")
            for i in range(len(bs) - 1):
                if bs[i] and bs[i + 1]:
                    want[bytes(bs[i:i + 2]).decode("latin-1")] += 1
        ds = rd.from_arrow(pa.table({"text": pa.array(texts)}))
        out = char_pair_counts(ds.repartition(3), k=50).to_pandas()
        got = dict(zip(out["pair"], out["n"]))
        assert got == dict(want)


class TestDomainStats:
    def test_counts_and_lowercase_host(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from obsidian_parser_ray.stages.text import domain_stats

        docs = pa.table(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "see https://A.example.com/x and http://b.org "
                    "plus https://a.example.com/y",
                    "nothing here",
                    "http://b.org http://b.org/path ftp://skip.me "
                    "https//not.a.url",
                ],
            }
        )
        out = domain_stats(rd.from_arrow(docs)).to_pandas()
        got = {r.domain: (r.n_hits, r.n_docs) for r in out.itertuples()}
        assert got == {"a.example.com": (2, 1), "b.org": (3, 2)}

    def test_empty_and_urlless(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from obsidian_parser_ray.stages.text import domain_stats

        docs = pa.table({"doc_id": [1], "text": ["plain words only"]})
        assert domain_stats(rd.from_arrow(docs)).count() == 0

    def test_scheme_only_token_is_not_a_hit(self, ray_session):
        # 'http://' matches the URL prefix filter but extracts no
        # host; it must yield no domain row (ADVICE r4: the null host
        # used to pass through as a null-domain group)
        import pyarrow as pa
        import ray.data as rd

        from obsidian_parser_ray.stages.text import domain_stats

        docs = pa.table(
            {
                "doc_id": [1, 2],
                "text": [
                    "broken http:// and https:// markers",
                    "real https://ok.example.com/x plus http://",
                ],
            }
        )
        out = domain_stats(rd.from_arrow(docs)).to_pandas()
        got = {r.domain: (r.n_hits, r.n_docs) for r in out.itertuples()}
        assert got == {"ok.example.com": (1, 1)}
