"""Per-language alphabet predicates, replicated bug-for-bug from the reference.

Reference: /root/reference/src/main/scala/Language.scala

Three strategies (Language.scala:372-399):

* ``Explicit(letters)``  -- char-set membership (Language.scala:372-375).
  CRITICAL QUIRK: the reference builds most sets with ``Set.range(a, b)``
  which in Scala is **end-exclusive**, so e.g. ``Set.range('a','z')`` is
  ``a..y`` -- the letter ``z`` is NOT part of the English/Spanish/French/...
  alphabets (Language.scala:421-434).  Words containing ``z`` are silently
  dropped by the whole-word gate.  We replicate this exactly.

* ``Scripted(scripts)``  -- every char's UnicodeScript must be in the set
  (Language.scala:383-387).  Replicated with explicit BMP range tables below
  (the reference operates on Java ``Char``s, i.e. BMP code units only; lone
  surrogates have script UNKNOWN and therefore never match).

* ``Blocked(blocks)``    -- VERIFIED BUG (Language.scala:395-399): maps chars
  to UnicodeScript values then tests membership in a Seq[UnicodeBlock]; the
  types never match, so the predicate is always false for non-empty input.
  Indonesian and Latin therefore accept zero words -- dead languages.

Additional replicated quirks:

* Tamil: ``Set.range(0x11FC0.toChar, 0x11FFF.toChar)`` (Language.scala:431)
  -- ``.toChar`` truncates to 16 bits, so the intended astral Tamil range
  actually adds BMP range ``0x1FC0..0x1FFE`` (Greek Extended).  Replicated.
* Urdu: ``Set.range('\\u0627','\\u06D2')`` excludes U+06D2 itself.
* Thai:  ``Set.range('\\u0e00','\\u0e4f')`` => 0x0E00..0x0E4E.
* Hindi: 0x0900..0x097E, 0xA8E0..0xA8FE, 0x1CD0..0x1CFE (all end-exclusive).
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Unicode script ranges (BMP only -- the reference works on Java chars).
# Derived from the public Unicode Scripts.txt database (the version shipped
# with JDK 17 / Unicode 13).  Only the six scripts the reference names are
# needed (Language.scala:266-289).
# ---------------------------------------------------------------------------

_SCRIPT_RANGES: dict[str, list[tuple[int, int]]] = {
    "HANGUL": [
        (0x1100, 0x11FF), (0x302E, 0x302F), (0x3131, 0x318E),
        (0x3200, 0x321E), (0x3260, 0x327E), (0xA960, 0xA97C),
        (0xAC00, 0xD7A3), (0xD7B0, 0xD7C6), (0xD7CB, 0xD7FB),
        (0xFFA0, 0xFFBE), (0xFFC2, 0xFFC7), (0xFFCA, 0xFFCF),
        (0xFFD2, 0xFFD7), (0xFFDA, 0xFFDC),
    ],
    "HAN": [
        (0x2E80, 0x2E99), (0x2E9B, 0x2EF3), (0x2F00, 0x2FD5),
        (0x3005, 0x3005), (0x3007, 0x3007), (0x3021, 0x3029),
        (0x3038, 0x303B), (0x3400, 0x4DBF), (0x4E00, 0x9FFC),
        (0xF900, 0xFA6D), (0xFA70, 0xFAD9),
    ],
    "CYRILLIC": [
        (0x0400, 0x0484), (0x0487, 0x052F), (0x1C80, 0x1C88),
        (0x1D2B, 0x1D2B), (0x1D78, 0x1D78), (0x2DE0, 0x2DFF),
        (0xA640, 0xA69F), (0xFE2E, 0xFE2F),
    ],
    "ARABIC": [
        (0x0600, 0x0604), (0x0606, 0x060B), (0x060D, 0x061A),
        (0x061C, 0x061E), (0x0620, 0x063F), (0x0641, 0x064A),
        (0x0656, 0x066F), (0x0671, 0x06DC), (0x06DE, 0x06FF),
        (0x0750, 0x077F), (0x08A0, 0x08B4), (0x08B6, 0x08C7),
        (0x08D3, 0x08E1), (0x08E3, 0x08FF), (0xFB50, 0xFBC1),
        (0xFBD3, 0xFD3D), (0xFD50, 0xFD8F), (0xFD92, 0xFDC7),
        (0xFDF0, 0xFDFD), (0xFE70, 0xFE74), (0xFE76, 0xFEFC),
    ],
    "HIRAGANA": [
        (0x3041, 0x3096), (0x309D, 0x309F),
    ],
    "KATAKANA": [
        (0x30A1, 0x30FA), (0x30FD, 0x30FF), (0x31F0, 0x31FF),
        (0x32D0, 0x32FE), (0x3300, 0x3357), (0xFF66, 0xFF6F),
        (0xFF71, 0xFF9D),
    ],
}


def _chars(ranges: list[tuple[int, int]]) -> frozenset[str]:
    out: set[str] = set()
    for lo, hi in ranges:
        out.update(chr(c) for c in range(lo, hi + 1))
    return frozenset(out)


_SCRIPT_CHARS = {name: _chars(r) for name, r in _SCRIPT_RANGES.items()}


def _srange(lo: int, hi_exclusive: int) -> frozenset[str]:
    """Scala ``Set.range`` semantics: END-EXCLUSIVE (Language.scala:421-434)."""
    return frozenset(chr(c) for c in range(lo, hi_exclusive))


# ---------------------------------------------------------------------------
# Explicit letter sets (Language.scala:420-440), Set.range end-exclusive.
# ---------------------------------------------------------------------------

_AZ = _srange(ord("a"), ord("z"))  # a..y -- 'z' excluded (Scala Set.range bug)

LETTERS: dict[str, frozenset[str]] = {
    # Language.scala:421 -- note duplicated 'è' in the source is a no-op in a Set
    "norwegian": _AZ | frozenset("æøåéèêóòôùüà"),
    # Language.scala:422 -- Set.range('฀','๏') => 0E00..0E4E
    "thai": _srange(0x0E00, 0x0E4F),
    "spanish": _AZ | frozenset("ñáéíóúü"),                       # :423
    "estonian": frozenset("abdeghijklmnoprstuvõäöü"),            # :424 explicit
    "dutch": _AZ | frozenset("áéíóúàèëïöüĳ"),                    # :425
    "portuguese": _AZ | frozenset("áéíóúçâêôãõàèìòù"),           # :426
    # Language.scala:427 -- three end-exclusive ranges
    "hindi": _srange(0x0900, 0x097F) | _srange(0xA8E0, 0xA8FF) | _srange(0x1CD0, 0x1CFF),
    "french": _AZ | frozenset("çéâêîôûàèìòùëïü"),                # :428
    "turkish": _AZ | frozenset("çğiöşü"),                        # :429
    "english": _AZ,                                              # :430
    # Language.scala:431 -- 0x11FC0.toChar truncates to 0x1FC0 (BUG, replicated)
    "tamil": _srange(0x0B80, 0x0BFF) | _srange(0x1FC0, 0x1FFF),
    "romanian": _AZ | frozenset("ăâîșț"),                        # :432
    "swedish": _AZ | frozenset("åäöé"),                          # :433
    "urdu": _srange(0x0627, 0x06D2),                             # :434 (06D2 excluded)
    # Language.scala:435-439 -- explicit inclusive Set(...), exact codepoints
    "pushto": frozenset(map(chr, [
        0x0627, 0x0622, 0x0628, 0x067E, 0x062A, 0x067C, 0x062B, 0x062C,
        0x0686, 0x062D, 0x062E, 0x0685, 0x0681, 0x062F, 0x0689, 0x0630,
        0x0631, 0x0693, 0x0632, 0x0698, 0x0696, 0x0633, 0x0634, 0x069A,
        0x0635, 0x0636, 0x0637, 0x0638, 0x0639, 0x063A, 0x0641, 0x0642,
        0x06A9, 0x06AB, 0x0644, 0x0645, 0x0646, 0x06BC, 0x06BA, 0x0648,
        0x0647, 0x06C0, 0x064A, 0x06D0, 0x06CC, 0x06D2, 0x06CD, 0x0626,
    ])),
}


# ---------------------------------------------------------------------------
# Language registry (Language.scala:266-289, declaration order).
# strategy: ("explicit", letters_key) | ("scripted", [script,...]) | ("blocked",)
# per_char: WhitespaceIgnored mixin (Language.scala:407-413).
# ---------------------------------------------------------------------------

LANGUAGE_DEFS: list[tuple[str, tuple, bool]] = [
    ("thai", ("explicit", "thai"), True),                    # :266
    ("korean", ("scripted", ["HANGUL", "HAN"]), True),       # :267
    ("indonesian", ("blocked",), False),                     # :268 dead (bug)
    ("spanish", ("explicit", "spanish"), False),             # :269
    ("russian", ("scripted", ["CYRILLIC"]), False),          # :270
    ("arabic", ("scripted", ["ARABIC"]), False),             # :271
    ("latin", ("blocked",), False),                          # :272 dead (bug)
    ("estonian", ("explicit", "estonian"), False),           # :273
    ("dutch", ("explicit", "dutch"), False),                 # :274
    ("portugese", ("explicit", "portuguese"), False),        # :275 (sic)
    ("persian", ("scripted", ["ARABIC"]), False),            # :276 (== arabic)
    ("japanese", ("scripted", ["HIRAGANA", "KATAKANA", "HAN"]), True),  # :277
    ("chinese", ("scripted", ["HAN"]), True),                # :278
    ("hindi", ("explicit", "hindi"), False),                 # :279
    ("french", ("explicit", "french"), False),               # :280
    ("turkish", ("explicit", "turkish"), False),             # :281
    ("english", ("explicit", "english"), False),             # :282
    ("tamil", ("explicit", "tamil"), False),                 # :283
    ("romanian", ("explicit", "romanian"), False),           # :284
    ("pushto", ("explicit", "pushto"), False),               # :285
    ("swedish", ("explicit", "swedish"), False),             # :286
    ("urdu", ("explicit", "urdu"), False),                   # :287
    ("bokmål", ("explicit", "norwegian"), False),            # :288
    ("nynorsk", ("explicit", "norwegian"), False),           # :289 (same letters)
]

LANGUAGES: list[str] = [name for name, _, _ in LANGUAGE_DEFS]
DEAD_LANGUAGES: frozenset[str] = frozenset({"indonesian", "latin"})
PER_CHAR_LANGUAGES: frozenset[str] = frozenset(
    name for name, _, per_char in LANGUAGE_DEFS if per_char
)

# Materialized accepted-char set per language (empty for dead languages).
ALPHABET: dict[str, frozenset[str]] = {}
for _name, _strategy, _ in LANGUAGE_DEFS:
    if _strategy[0] == "explicit":
        ALPHABET[_name] = LETTERS[_strategy[1]]
    elif _strategy[0] == "scripted":
        acc: frozenset[str] = frozenset()
        for _s in _strategy[1]:
            acc = acc | _SCRIPT_CHARS[_s]
        ALPHABET[_name] = acc
    else:  # blocked -- always-false predicate (Language.scala:395-399)
        ALPHABET[_name] = frozenset()


def may_contain(language: str, chars: str) -> bool:
    """``Language.mayContain`` (Language.scala:74,372-399): True iff ALL chars
    are valid for *language*.  Empty input is vacuously true (forall on empty);
    the tokenizer never passes empty words (Language.scala:90)."""
    alpha = ALPHABET[language]
    return all(c in alpha for c in chars)


def is_per_char(language: str) -> bool:
    """WhitespaceIgnored mixin membership (Language.scala:266,267,277,278)."""
    return language in PER_CHAR_LANGUAGES


def for_name(name: str) -> str | None:
    """``Language.forName`` (Language.scala:448-474): strip+lowercase match."""
    key = name.strip().lower()
    return key if key in _NAME_SET else None


_NAME_SET = frozenset(LANGUAGES)

# ISO-639-1 codes for the fixture tables (FIXTURES.md §2).
ISO639: dict[str, str] = {
    "thai": "th", "indonesian": "id", "spanish": "es", "estonian": "et",
    "russian": "ru", "pushto": "ps", "arabic": "ar", "latin": "la",
    "persian": "fa", "chinese": "zh", "japanese": "ja", "korean": "ko",
    "hindi": "hi", "french": "fr", "turkish": "tr", "english": "en",
    "tamil": "ta", "romanian": "ro", "dutch": "nl", "portugese": "pt",
    "swedish": "sv", "urdu": "ur", "bokmål": "nb", "nynorsk": "nn",
}
ISO_TO_LANGUAGE: dict[str, str] = {v: k for k, v in ISO639.items()}
