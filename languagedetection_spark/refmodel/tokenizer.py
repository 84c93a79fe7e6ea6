"""Java-faithful tokenizer, replicating ``Language.splitWords`` exactly.

Reference: /root/reference/src/main/scala/Language.scala:85-90 (default) and
:407-413 (``WhitespaceIgnored`` per-char mode for thai/korean/japanese/chinese).

Replicated quirks (all verified against the Scala/JDK semantics):

* Hyphens are NOT split points in practice: ``'-'`` fails the letter/ws/
  apostrophe filter (:88) and is deleted BEFORE the split (:89), fusing
  compounds ("well-known" -> "wellknown").  The ``-`` branch of the split
  regex is dead code.
* Java's default regex ``\\s`` is ASCII-only (``[ \\t\\n\\x0B\\f\\r]``), but the
  char filter keeps ALL Java whitespace (``Character.isWhitespace``) -- so a
  Unicode space (e.g. U+2000) survives the filter, is not a split point, and
  the resulting token then fails every alphabet gate.
* ``Character.isWhitespace`` excludes non-breaking spaces U+00A0/U+2007/U+202F
  (those are deleted by the filter like any other symbol).
* Whole-word alphabet gating: one out-of-alphabet char kills the word (:90).
  In particular apostrophes survive the filter but belong to NO alphabet, so
  "don't" is dropped by every language.
* Java chars are UTF-16 code units: astral (non-BMP) code points are two
  surrogates, each failing ``isLetter`` -- we treat any code point > 0xFFFF
  as a non-letter.
* Per-char mode (:407-413): no strip/lower first -- each ORIGINAL-case char
  that is a letter AND passes ``mayContain`` becomes one lower-cased token.
"""

from __future__ import annotations

import re
import unicodedata
from functools import lru_cache

from .alphabets import ALPHABET, is_per_char

_LETTER_CATS = frozenset({"Lu", "Ll", "Lt", "Lm", "Lo"})
# Java regex \s (no UNICODE_CHARACTER_CLASS flag) is ASCII-only.
_JAVA_SPLIT = re.compile(r"[ \t\n\x0b\f\r-]+")


@lru_cache(maxsize=4096)
def _is_java_letter(c: str) -> bool:
    return ord(c) <= 0xFFFF and unicodedata.category(c) in _LETTER_CATS


@lru_cache(maxsize=4096)
def _is_java_whitespace(c: str) -> bool:
    """``Character.isWhitespace`` (JLS): \\t..\\r, \\x1C..\\x1F, or a Unicode
    space character (Zs/Zl/Zp) that is not a non-breaking space."""
    o = ord(c)
    if 0x09 <= o <= 0x0D or 0x1C <= o <= 0x1F:
        return True
    if o in (0x00A0, 0x2007, 0x202F):
        return False
    return o <= 0xFFFF and unicodedata.category(c) in ("Zs", "Zl", "Zp")


def _java_strip(text: str) -> str:
    """``String.strip()``: trim leading/trailing ``Character.isWhitespace``."""
    start, end = 0, len(text)
    while start < end and _is_java_whitespace(text[start]):
        start += 1
    while end > start and _is_java_whitespace(text[end - 1]):
        end -= 1
    return text[start:end]


def split_words(text: str, language: str) -> list[str]:
    """``Language.splitWords`` for *language* (Language.scala:85-90,407-413)."""
    alpha = ALPHABET[language]
    if is_per_char(language):
        # WhitespaceIgnored: filter(isLetter && mayContain).map(toLower)
        return [
            c.lower()
            for c in text
            if _is_java_letter(c) and c in alpha
        ]
    lowered = _java_strip(text).lower()
    filtered = "".join(
        c for c in lowered
        if _is_java_letter(c) or _is_java_whitespace(c) or c == "'"
    )
    return [
        w for w in _JAVA_SPLIT.split(filtered)
        if w and all(c in alpha for c in w)
    ]
