"""Code tokenization, segmentation and surface normalization.

The reference operates on Chinese character sequences split into sentences
(``cn_data_manager.py:118-172``); for source-code documents the tag-unit is
a code token and the sentence-analogue is a bounded window of lines
(SURVEY.md §7 stage map: "window/segment content into tag-units ≙ sentence
split S2/M9").

``normalize_surface`` is the canonical-key normalizer used by the
canonicalization groupby (NFC, casefold, identifier-split; SURVEY.md §2.9).
"""

from __future__ import annotations

import re
import unicodedata

# identifiers | numbers | one non-space symbol
_TOKEN_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*|\d+|[^\sA-Za-z0-9_]")
_CAMEL_RE = re.compile(r"(?<=[a-z0-9])(?=[A-Z])|(?<=[A-Z])(?=[A-Z][a-z])")


def tokenize(text: str) -> list[str]:
    """Split code text into tokens (identifier / number / symbol)."""
    return _TOKEN_RE.findall(text)


def segment_tokens(text: str, max_tokens: int) -> list[list[str]]:
    """Window a document into tag-unit segments of at most ``max_tokens``
    tokens, breaking on line boundaries when possible (sentence-split
    analogue of cn_data_manager.py:147-172; unlike the reference's hard
    truncation at ``max_seq_length-2`` (le_loader.py:147) we *window* so no
    content is dropped — required at corpus scale)."""
    segments: list[list[str]] = []
    cur: list[str] = []
    for line in text.splitlines():
        toks = tokenize(line)
        if not toks:
            continue
        # hard-split pathological single lines
        while len(toks) > max_tokens:
            if cur:
                segments.append(cur)
                cur = []
            segments.append(toks[:max_tokens])
            toks = toks[max_tokens:]
        if len(cur) + len(toks) > max_tokens and cur:
            segments.append(cur)
            cur = []
        cur.extend(toks)
    if cur:
        segments.append(cur)
    return segments


def normalize_surface(tokens: list[str] | tuple) -> str:
    """Normalized mention key: NFC, casefold, camelCase/snake_case split,
    joined by single spaces. This is the groupby key of the
    canonicalization stage (G4; ``label_collections.py:63-95`` groups by
    exact surface — we add unicode/identifier normalization per the north
    rule's "normalized mention keys")."""
    parts: list[str] = []
    for tok in tokens:
        tok = unicodedata.normalize("NFC", tok)
        for piece in tok.replace("_", " ").split():
            parts.extend(_CAMEL_RE.split(piece))
    return " ".join(p.casefold() for p in parts if p)


# --- oracle-contract whitespace tokenization -------------------------------
# DuckDB's regex engine is RE2, whose \s is the ASCII class [\t\n\f\r ]
# and \w is [0-9A-Za-z_]; Python's str.split() / re '\s' are Unicode-wider
# (\x0b, \xa0,  , ...). Every operator whose DuckDB oracle tokenizes
# with string_split_regex(text, '\s+') MUST tokenize through this ONE
# helper so both sides agree on every input, not just ASCII fixtures.
ASCII_WS_RE = re.compile(r"[ \t\n\f\r]+")


def ws_tokens(text: str | None) -> list[str]:
    """Non-empty tokens of ``text`` split on the RE2 ``\\s`` class —
    equals ``list_filter(string_split_regex(text, '\\s+'), w -> w <> '')``
    in DuckDB for ALL inputs (including Unicode whitespace, which is NOT
    a separator here, matching RE2)."""
    if not text:
        return []
    return [w for w in ASCII_WS_RE.split(text) if w]
