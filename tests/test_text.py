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
