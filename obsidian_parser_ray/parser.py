"""Reference-parity markdown parsing kernels.

Pure Python re-implementations of the obsidian-parser note parsing
semantics (reference: ``/root/reference/src/note/parser.rs``,
``note_tags.rs``, ``note_aliases.rs``).  These are the single source of
truth for parsing used by both the batched Ray Data extract stage
(:mod:`obsidian_parser_ray.stages.extract`) and the pure-Python oracle
(:mod:`obsidian_parser_ray.oracle`), so span-level parity is by
construction.

Exact semantics mirrored (file:line cites into /root/reference):

* ``parse_note`` — parser.rs:58-76.  Frontmatter iff the FIRST line,
  ``trim_end()``-ed, equals ``---`` (leading spaces disqualify).  The
  closing delimiter is the next ``---`` *substring* found from byte 3 —
  NOT line-anchored (parser.rs:65).  ``properties = raw[3:closed+3].strip()``,
  ``content = raw[closed+6:].strip()``.  A missing closer raises
  :class:`NotFoundCloser`.
* ``parse_links`` — parser.rs:21-37.  Non-overlapping scan for ``[[``;
  for each, the next ``]]``; target = inner split on ``#`` then ``^``
  then ``|`` taking the first piece, then ``strip()``.  Duplicates and
  occurrence order preserved; unmatched ``[[`` dropped; ``![[x]]``
  embeds match identically (we additionally report the preceding ``!``).
* ``parse_inline_tags`` — note_tags.rs:30-61.  ``split_whitespace``,
  words starting ``#`` whose second byte is not ``#``; tag = longest
  prefix of chars in {alphanumeric, emoji != '#', '_', '-'}; empty
  prefix dropped.
"""

from __future__ import annotations

import hashlib
import re
from typing import NamedTuple

YAML_IMPORT_ERROR: Exception | None = None
try:  # PyYAML ships with ray; guard anyway per environment rules.
    import yaml

    # libyaml's CSafeLoader is ~7x faster than the pure-Python
    # SafeLoader and YAML-1.1-equivalent for safe loading; fall back
    # transparently when the extension is absent.
    _YAML_LOADER = getattr(yaml, "CSafeLoader", yaml.SafeLoader)
except Exception as _e:  # pragma: no cover
    yaml = None  # type: ignore[assignment]
    YAML_IMPORT_ERROR = _e


class NotFoundCloser(ValueError):
    """Frontmatter opened with ``---`` but never closed (parser.rs:51-55)."""


class ParsedNote(NamedTuple):
    content: str
    properties: str | None  # raw YAML text; None = no frontmatter


def parse_note(raw_text: str) -> ParsedNote:
    """Split raw markdown into (content, frontmatter-YAML).

    Parity with parser.rs:58-76 including all edge cases covered by the
    reference tests (parser.rs:78-169): ``---`` inside the body, CRLF,
    space-prefixed first line (no frontmatter), ``test_data---`` (no
    frontmatter), ``---`` alone (NotFoundCloser).

    Note: a note WITHOUT frontmatter keeps its text verbatim (the
    reference's ``WithoutProperties`` branch returns the raw string —
    no trim), while WITH frontmatter both halves are ``strip()``-ed.
    """
    first_line = raw_text.split("\n", 1)[0]
    if first_line.rstrip() != "---":
        return ParsedNote(content=raw_text, properties=None)
    closed = raw_text.find("---", 3)
    if closed == -1:
        raise NotFoundCloser("Not found closer in yaml like `---`")
    # parser.rs uses an index relative to raw[3..]; ours is absolute,
    # so properties = raw[3:closed], content = raw[closed+3:].
    return ParsedNote(
        content=raw_text[closed + 3 :].strip(),
        properties=raw_text[3:closed].strip(),
    )


class Mention(NamedTuple):
    target_key: str  # split/trimmed link target, e.g. "Note"
    raw_inner: str  # text between [[ and ]]
    is_embed: bool  # preceded by '!' (``![[x]]``)
    start: int  # byte offset of the '[[' in the text


def parse_links(text: str) -> list[Mention]:
    """Extract wikilink mentions (parser.rs:21-37).

    Returns occurrence-ordered mentions.  The reference treats
    ``![[x]]`` identically to ``[[x]]`` (the ``!`` is never inspected,
    parser.rs:22); we additionally flag it so the ``embeds`` predicate
    can be split out (SURVEY.md §7.2).  Overlap behavior matches Rust
    ``match_indices`` (non-overlapping ``[[`` scan): ``[[a [[b]]``
    yields targets ``"a [[b"`` and ``"b"``.
    """
    out: list[Mention] = []
    pos = 0
    n = len(text)
    while True:
        start = text.find("[[", pos)
        if start == -1:
            break
        pos = start + 2  # non-overlapping, like str::match_indices
        end = text.find("]]", start + 2)
        if end == -1:
            continue
        inner = text[start + 2 : end]
        target = inner.split("#", 1)[0].split("^", 1)[0].split("|", 1)[0].strip()
        is_embed = start > 0 and text[start - 1] == "!"
        out.append(Mention(target, inner, is_embed, start))
    del n
    return out


# EXACT Unicode Emoji-property table (emoji-data.txt "Emoji"), generated
# from the `regex` module's bundled Unicode Character Database — replaces
# the former approximate block ranges (which wrongly accepted ~1000
# non-emoji codepoints, e.g. U+219A-U+21A8 arrows).  The reference uses
# unic_emoji_char::is_emoji (note_tags.rs:40-41), which pins Unicode
# 10.0 emoji-data; the ONLY remaining divergence is codepoints that
# GAINED the Emoji property after Unicode 10 (e.g. U+1F7E0.. colored
# shapes, late 1F9xx, 1FAxx) — we accept them, unic 0.9 would not.
# '#' (0x23) is in the property but excluded by the caller, as in the
# reference.
_EMOJI_RANGES: tuple[tuple[int, int], ...] = (
    (0x23, 0x23),
    (0x2A, 0x2A),
    (0x30, 0x39),
    (0xA9, 0xA9),
    (0xAE, 0xAE),
    (0x203C, 0x203C),
    (0x2049, 0x2049),
    (0x2122, 0x2122),
    (0x2139, 0x2139),
    (0x2194, 0x2199),
    (0x21A9, 0x21AA),
    (0x231A, 0x231B),
    (0x2328, 0x2328),
    (0x23CF, 0x23CF),
    (0x23E9, 0x23F3),
    (0x23F8, 0x23FA),
    (0x24C2, 0x24C2),
    (0x25AA, 0x25AB),
    (0x25B6, 0x25B6),
    (0x25C0, 0x25C0),
    (0x25FB, 0x25FE),
    (0x2600, 0x2604),
    (0x260E, 0x260E),
    (0x2611, 0x2611),
    (0x2614, 0x2615),
    (0x2618, 0x2618),
    (0x261D, 0x261D),
    (0x2620, 0x2620),
    (0x2622, 0x2623),
    (0x2626, 0x2626),
    (0x262A, 0x262A),
    (0x262E, 0x262F),
    (0x2638, 0x263A),
    (0x2640, 0x2640),
    (0x2642, 0x2642),
    (0x2648, 0x2653),
    (0x265F, 0x2660),
    (0x2663, 0x2663),
    (0x2665, 0x2666),
    (0x2668, 0x2668),
    (0x267B, 0x267B),
    (0x267E, 0x267F),
    (0x2692, 0x2697),
    (0x2699, 0x2699),
    (0x269B, 0x269C),
    (0x26A0, 0x26A1),
    (0x26A7, 0x26A7),
    (0x26AA, 0x26AB),
    (0x26B0, 0x26B1),
    (0x26BD, 0x26BE),
    (0x26C4, 0x26C5),
    (0x26C8, 0x26C8),
    (0x26CE, 0x26CF),
    (0x26D1, 0x26D1),
    (0x26D3, 0x26D4),
    (0x26E9, 0x26EA),
    (0x26F0, 0x26F5),
    (0x26F7, 0x26FA),
    (0x26FD, 0x26FD),
    (0x2702, 0x2702),
    (0x2705, 0x2705),
    (0x2708, 0x270D),
    (0x270F, 0x270F),
    (0x2712, 0x2712),
    (0x2714, 0x2714),
    (0x2716, 0x2716),
    (0x271D, 0x271D),
    (0x2721, 0x2721),
    (0x2728, 0x2728),
    (0x2733, 0x2734),
    (0x2744, 0x2744),
    (0x2747, 0x2747),
    (0x274C, 0x274C),
    (0x274E, 0x274E),
    (0x2753, 0x2755),
    (0x2757, 0x2757),
    (0x2763, 0x2764),
    (0x2795, 0x2797),
    (0x27A1, 0x27A1),
    (0x27B0, 0x27B0),
    (0x27BF, 0x27BF),
    (0x2934, 0x2935),
    (0x2B05, 0x2B07),
    (0x2B1B, 0x2B1C),
    (0x2B50, 0x2B50),
    (0x2B55, 0x2B55),
    (0x3030, 0x3030),
    (0x303D, 0x303D),
    (0x3297, 0x3297),
    (0x3299, 0x3299),
    (0x1F004, 0x1F004),
    (0x1F0CF, 0x1F0CF),
    (0x1F170, 0x1F171),
    (0x1F17E, 0x1F17F),
    (0x1F18E, 0x1F18E),
    (0x1F191, 0x1F19A),
    (0x1F1E6, 0x1F1FF),
    (0x1F201, 0x1F202),
    (0x1F21A, 0x1F21A),
    (0x1F22F, 0x1F22F),
    (0x1F232, 0x1F23A),
    (0x1F250, 0x1F251),
    (0x1F300, 0x1F321),
    (0x1F324, 0x1F393),
    (0x1F396, 0x1F397),
    (0x1F399, 0x1F39B),
    (0x1F39E, 0x1F3F0),
    (0x1F3F3, 0x1F3F5),
    (0x1F3F7, 0x1F4FD),
    (0x1F4FF, 0x1F53D),
    (0x1F549, 0x1F54E),
    (0x1F550, 0x1F567),
    (0x1F56F, 0x1F570),
    (0x1F573, 0x1F57A),
    (0x1F587, 0x1F587),
    (0x1F58A, 0x1F58D),
    (0x1F590, 0x1F590),
    (0x1F595, 0x1F596),
    (0x1F5A4, 0x1F5A5),
    (0x1F5A8, 0x1F5A8),
    (0x1F5B1, 0x1F5B2),
    (0x1F5BC, 0x1F5BC),
    (0x1F5C2, 0x1F5C4),
    (0x1F5D1, 0x1F5D3),
    (0x1F5DC, 0x1F5DE),
    (0x1F5E1, 0x1F5E1),
    (0x1F5E3, 0x1F5E3),
    (0x1F5E8, 0x1F5E8),
    (0x1F5EF, 0x1F5EF),
    (0x1F5F3, 0x1F5F3),
    (0x1F5FA, 0x1F64F),
    (0x1F680, 0x1F6C5),
    (0x1F6CB, 0x1F6D2),
    (0x1F6D5, 0x1F6D8),
    (0x1F6DC, 0x1F6E5),
    (0x1F6E9, 0x1F6E9),
    (0x1F6EB, 0x1F6EC),
    (0x1F6F0, 0x1F6F0),
    (0x1F6F3, 0x1F6FC),
    (0x1F7E0, 0x1F7EB),
    (0x1F7F0, 0x1F7F0),
    (0x1F90C, 0x1F93A),
    (0x1F93C, 0x1F945),
    (0x1F947, 0x1F9FF),
    (0x1FA70, 0x1FA7C),
    (0x1FA80, 0x1FA8A),
    (0x1FA8E, 0x1FAC6),
    (0x1FAC8, 0x1FAC8),
    (0x1FACD, 0x1FADC),
    (0x1FADF, 0x1FAEA),
    (0x1FAEF, 0x1FAF8),
)

# O(1) membership: the property is only 1438 codepoints
_EMOJI_CPS = frozenset(
    cp for lo, hi in _EMOJI_RANGES for cp in range(lo, hi + 1)
)


def _is_emoji(c: str) -> bool:
    return ord(c) in _EMOJI_CPS


def _tag_char_ok(c: str) -> bool:
    """check_good closure, note_tags.rs:40-41."""
    return c.isalnum() or (c != "#" and _is_emoji(c)) or c in "_-"


def parse_inline_tags(content: str) -> list[str]:
    """Inline ``#tag`` extraction (note_tags.rs:44-57).

    Golden vector (note_tags.rs:72-83): ``#super_tag`` → super_tag,
    ``##no_tag`` rejected, ``#warning_tag!`` → warning_tag,
    ``#two-tag`` → two-tag, ``#kek;d`` → kek, ``#dfds#`` → dfds,
    ``#all,`` → all, ``#татар`` → татар, ``#d😭`` → d😭.
    """
    if "#" not in content:
        return []
    tags: list[str] = []
    # regex-prefiltered equivalent of `content.split()` + startswith('#'):
    # (?<!\S)#(\S*) yields exactly the split_whitespace words that start
    # with '#' (verified property-equivalent incl. exotic whitespace).
    for rest in _TAG_WORD_RE.findall(content):
        # note_tags.rs:46 compares the second BYTE to b'#'
        if rest[:1] == "#":
            continue
        end = len(rest)
        for i, c in enumerate(rest):
            if not _tag_char_ok(c):
                end = i
                break
        if end > 0:
            tags.append(rest[:end])
    return tags


# "word" chars = NOT Unicode-White_Space.  Python's \S excludes
# \x1c-\x1f (Python isspace() counts them; Rust char::is_whitespace —
# the White_Space property — does NOT), so the class re-includes them
# for exact split_whitespace parity.
_TAG_WORD_RE = re.compile(r"(?<![\S\x1c-\x1f])#([\S\x1c-\x1f]*)")


# Trivial-frontmatter fast path: the overwhelmingly common shape is a
# flat map of `key: scalar` lines, and full YAML loading is ~30% of
# link-path extract CPU (profiled on the bench corpus).  A line
# qualifies only when its value provably parses to the SAME value under
# pyyaml's YAML-1.1 resolvers:
#   * plain int with no leading zeros / '+' / '_' (leading-zero forms
#     are OCTAL in YAML 1.1, so they fall back),
#   * or a letter/underscore-led token of [A-Za-z0-9 _./-] that is not
#     a bool word — no YAML-1.1 scalar resolver (int, float, octal,
#     sexagesimal, timestamp, null, merge) can match a letter-led
#     string, so these are always plain strings.
# ANYTHING else (quotes, lists, nesting, floats, dates, '#', '&', ...)
# falls back to the real loader, so error semantics and exotic values
# are untouched — the fast path is value-parity-tested against pyyaml
# in tests/test_parser_frontmatter.py.
_FAST_FM_LINE = re.compile(
    r"^([A-Za-z_][A-Za-z0-9_-]*): +([^\s].*?) *$"
)
_FAST_INT = re.compile(r"^-?(0|[1-9][0-9]*)$")
_FAST_STR = re.compile(r"^[A-Za-z_][A-Za-z0-9 _./-]*$")
_YAML_BOOL_WORDS = frozenset((
    "yes", "no", "true", "false", "on", "off", "null",
))


def _parse_properties_fast(text: str):
    """→ dict when the WHOLE block is trivially parseable, else None."""
    props: dict = {}
    for line in text.split("\n"):
        if not line.strip():
            continue
        m = _FAST_FM_LINE.match(line)
        if m is None:
            return None
        key, val = m.group(1), m.group(2)
        if _FAST_INT.match(val):
            props[key] = int(val)
        elif _FAST_STR.match(val) and val.lower() not in _YAML_BOOL_WORDS:
            props[key] = val
        else:
            return None
    return props if props else None


def parse_properties(properties_text: str | None) -> tuple[dict | None, str | None]:
    """YAML-parse a frontmatter block (note_in_memory.rs:163-187).

    Returns ``(mapping_or_None, error_message_or_None)``.  Invalid YAML
    or a non-mapping document is reported as an error string (the
    reference surfaces ``Error::Yaml`` per note; callers choose
    skip-vs-fail — vault_open/mod.rs:358-429).  Trivial flat maps take
    the resolver-parity fast path above; everything else loads through
    libyaml.
    """
    if properties_text is None:
        return None, None
    fast = _parse_properties_fast(properties_text)
    if fast is not None:
        return fast, None
    if yaml is None:  # pragma: no cover
        return None, f"yaml-unavailable: {YAML_IMPORT_ERROR}"
    try:
        val = yaml.load(properties_text, Loader=_YAML_LOADER)
    except Exception as e:
        return None, f"yaml: {e.__class__.__name__}: {e}"
    if val is None:
        return {}, None
    if not isinstance(val, dict):
        # serde into HashMap<String, Value> fails on non-mapping docs
        return None, "yaml: not a mapping"
    return val, None


class ListTypeError(ValueError):
    """A frontmatter field is not a sequence of strings (strict
    ``Vec<String>`` parity — serde_yml ``from_value::<Vec<String>>?``
    FAILS THE NOTE on a non-string item / non-sequence value,
    note_tags.rs:36, note_aliases.rs:86)."""


def _string_list(value, *, strict: bool = False) -> list[str]:
    """``serde_yml::from_value::<Vec<String>>`` equivalent.

    ``strict=True`` is exact reference parity: a non-sequence value or
    any non-string item raises :class:`ListTypeError` (the per-note
    error the reference surfaces).  ``strict=False`` (default) is the
    documented lenient superset: str items verbatim, scalar items
    stringified, everything else dropped, non-list → [].
    """
    if not isinstance(value, list):
        if strict:
            raise ListTypeError(
                f"expected a sequence of strings, got {type(value).__name__}"
            )
        return []
    out = []
    for v in value:
        if isinstance(v, str):
            out.append(v)
        elif strict:
            raise ListTypeError(
                f"expected a string item, got {type(v).__name__}: {v!r}"
            )
        elif isinstance(v, (int, float, bool)):
            out.append(str(v))
    return out


def frontmatter_tags(props: dict | None, *, strict: bool = False) -> list[str]:
    if not props or "tags" not in props:
        return []
    return _string_list(props["tags"], strict=strict)


def frontmatter_aliases(props: dict | None, *, strict: bool = False) -> list[str]:
    """note_aliases.rs:81-92 — absent → []; ``strict`` raises
    :class:`ListTypeError` on invalid values (reference ``?``)."""
    if not props or "aliases" not in props:
        return []
    return _string_list(props["aliases"], strict=strict)


def all_tags(props: dict | None, content: str) -> list[str]:
    """Frontmatter tags first, then inline in content order (note_tags.rs:60)."""
    return frontmatter_tags(props) + parse_inline_tags(content)


def is_todo(tags: list[str]) -> bool:
    """note_is_todo.rs:27-30 — exact membership of "todo"."""
    return "todo" in tags


def note_name(doc_id: str) -> str:
    """``path.file_stem()`` over the extension-less doc key (mod.rs:79-86)."""
    return doc_id.rsplit("/", 1)[-1]


def parent_of(doc_id: str) -> str | None:
    """Path parent for the ``child_of`` predicate (SURVEY.md §7.2)."""
    if "/" not in doc_id:
        return None
    return doc_id.rsplit("/", 1)[0]


# Rust-parity word chars: runs of NOT-White_Space (\x1c-\x1f are NOT
# White_Space, though Python isspace() claims they are)
_RUST_WORD_RE = re.compile(r"[\S\x1c-\x1f]+")


def word_count(content: str, encoded: bytes | None = None) -> int:
    """``split_whitespace().count()`` (mod.rs:100-103).

    Whitespace = the Unicode White_Space property (Rust
    ``char::is_whitespace``) — NOT Python ``str.split`` semantics,
    which additionally split on \\x1c-\\x1f.  ASCII fast path counts
    boundary transitions with numpy over the already-encoded bytes;
    non-ASCII falls back to a regex with the same class.
    """
    if encoded is not None and len(encoded) == len(content):
        if not content:
            return 0
        import numpy as np

        arr = np.frombuffer(encoded, dtype=np.uint8)
        # ASCII White_Space subset = {\t..\r, space} ONLY
        is_ws = ((arr >= 9) & (arr <= 13)) | (arr == 32)
        non_ws = ~is_ws
        starts = int(non_ws[0]) + int(np.count_nonzero(non_ws[1:] & is_ws[:-1]))
        return starts
    return len(_RUST_WORD_RE.findall(content))


def byte_count(content: str) -> int:
    """``content.len()`` — BYTES, not chars (mod.rs:119-122)."""
    return len(content.encode("utf-8"))


def content_md5(content: str) -> str:
    """Content digest for exact dedup (vault_duplicates.rs:62-95 uses a
    pluggable ``digest::Digest``; we standardize on md5 hex so the
    DuckDB oracle can reproduce it with ``md5()``)."""
    return hashlib.md5(content.encode("utf-8")).hexdigest()


def render_note(content: str, properties_text: str | None) -> str:
    """Note → markdown file text (note_write.rs:81-90)."""
    if properties_text is None:
        return content
    return f"---\n{properties_text}\n---\n{content}"
