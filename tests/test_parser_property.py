"""Property-based parity tests (hypothesis) for the parser kernels.

The optimized kernels (regex-prefiltered tag scan, single-encode
extract) must agree with literal transcriptions of the reference
semantics on arbitrary input.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from obsidian_parser_ray.corpus import raw_from_spans, spans_from_raw
from obsidian_parser_ray.parser import (
    NotFoundCloser,
    _is_emoji,
    _tag_char_ok,
    parse_inline_tags,
    parse_links,
    parse_note,
)

# text exercising whitespace classes, emoji, unicode, link/tag chars,
# with '---' fragments mixed in to hit frontmatter edge cases
_PIECES = st.lists(
    st.sampled_from(list("ab #[]|^-_!привет😭中。\t\n\r\x0b\x0c 　") + ["---", "[[", "]]"]),
    max_size=60,
)
TEXT = _PIECES.map("".join)


def naive_inline_tags(content: str) -> list[str]:
    """Literal transcription of note_tags.rs:44-57."""
    tags = []
    for word in content.split():
        if not word.startswith("#"):
            continue
        if word.encode("utf-8")[1:2] == b"#":
            continue
        rest = word[1:]
        end = len(rest)
        for i, c in enumerate(rest):
            if not _tag_char_ok(c):
                end = i
                break
        if end > 0:
            tags.append(rest[:end])
    return tags


def naive_links(text: str):
    """Literal transcription of parser.rs:21-37 (match_indices + find)."""
    out = []
    pos = 0
    while True:
        start = text.find("[[", pos)
        if start == -1:
            return out
        pos = start + 2
        end = text.find("]]", start + 2)
        if end == -1:
            continue
        inner = text[start + 2 : end]
        out.append(inner.split("#", 1)[0].split("^", 1)[0].split("|", 1)[0].strip())


@settings(max_examples=300, deadline=None)
@given(TEXT)
def test_inline_tags_match_naive(content):
    assert parse_inline_tags(content) == naive_inline_tags(content)


@settings(max_examples=300, deadline=None)
@given(TEXT)
def test_links_match_naive(text):
    assert [m.target_key for m in parse_links(text)] == naive_links(text)


@settings(max_examples=300, deadline=None)
@given(TEXT)
def test_parse_note_total(raw):
    """parse_note never crashes; frontmatter detection is exactly the
    first-line rule; round-trip through spans preserves the parse."""
    try:
        parsed = parse_note(raw)
    except NotFoundCloser:
        assert raw.split("\n", 1)[0].rstrip() == "---"
        return
    first = raw.split("\n", 1)[0]
    assert (parsed.properties is not None) == (first.rstrip() == "---")
    # span round trip: re-parsing the rendered spans is a fixpoint
    spans = spans_from_raw(raw)
    rendered = raw_from_spans(spans)
    again = parse_note(rendered)
    assert again.content == parsed.content
    if parsed.properties is not None:
        assert again.properties == parsed.properties


def test_emoji_table_spotchecks():
    assert _is_emoji("😭") and _is_emoji("⚡") and _is_emoji("*")
    assert not _is_emoji("a") and not _is_emoji("я")
    assert _tag_char_ok("😭") and not _tag_char_ok("#")


@settings(max_examples=300, deadline=None)
@given(TEXT)
def test_word_count_fast_path_matches_split(text):
    from obsidian_parser_ray.parser import word_count

    enc = text.encode("utf-8")
    assert word_count(text, enc) == len(text.split())


def test_word_count_ascii_control_whitespace():
    from obsidian_parser_ray.parser import word_count

    for s in ["a\x1cb", "a\x1db c", " \x1e ", "", "x", "  lead", "trail  ",
              "\ta\vb\fc\rd\ne"]:
        assert word_count(s, s.encode()) == len(s.split())
