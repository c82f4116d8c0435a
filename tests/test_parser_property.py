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
    st.sampled_from(
        list("ab #[]|^-_!привет😭中。\t\n\r\x0b\x0c\x1c\x1d 　") + ["---", "[[", "]]"]
    ),
    max_size=60,
)
TEXT = _PIECES.map("".join)


def rust_split_whitespace(content: str) -> list[str]:
    """Literal transcription of Rust split_whitespace (Unicode
    White_Space property — which EXCLUDES \\x1c-\\x1f, unlike Python
    str.split)."""
    words, cur = [], []
    for c in content:
        if c.isspace() and c not in "\x1c\x1d\x1e\x1f":
            if cur:
                words.append("".join(cur))
                cur = []
        else:
            cur.append(c)
    if cur:
        words.append("".join(cur))
    return words


def naive_inline_tags(content: str) -> list[str]:
    """Literal transcription of note_tags.rs:44-57."""
    tags = []
    for word in rust_split_whitespace(content):
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
def test_word_count_fast_path_matches_rust_semantics(text):
    from obsidian_parser_ray.parser import word_count

    enc = text.encode("utf-8")
    expected = len(rust_split_whitespace(text))
    assert word_count(text, enc) == expected
    assert word_count(text, None) == expected


def test_word_count_ascii_control_whitespace():
    """\\x1c-\\x1f are WORD characters per Rust char::is_whitespace
    (Unicode White_Space), unlike Python str.split."""
    from obsidian_parser_ray.parser import word_count

    cases = {
        "a\x1cb": 1,  # Python split would say 2
        "a\x1db c": 2,
        " \x1e ": 1,
        "": 0,
        "x": 1,
        "  lead": 1,
        "trail  ": 1,
        "\ta\vb\fc\rd\ne": 5,
    }
    for s, n in cases.items():
        assert word_count(s, s.encode()) == n, s
