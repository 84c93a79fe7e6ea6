"""Unit tests for the pure-Python reference oracle (no Spark).

Each test pins a verified semantic of /root/reference (file:line cited in the
module docstrings) -- these are the edge-case vectors from FIXTURES.md §6.
"""

from languagedetection_spark.refmodel.alphabets import (
    ALPHABET, DEAD_LANGUAGES, ISO639, LANGUAGES, for_name, may_contain,
)
from languagedetection_spark.refmodel.classifier import (
    Vocabulary, train_semi_supervised,
)
from languagedetection_spark.refmodel.tokenizer import split_words


def test_language_registry():
    assert len(LANGUAGES) == 24
    assert len(set(LANGUAGES)) == 24
    assert set(ISO639) == set(LANGUAGES)


def test_for_name():
    assert for_name(" English ") == "english"
    assert for_name("BOKMÅL") == "bokmål"
    assert for_name("klingon") is None


def test_set_range_end_exclusive():
    # Scala Set.range('a','z') excludes 'z' (Language.scala:430)
    assert "y" in ALPHABET["english"]
    assert "z" not in ALPHABET["english"]
    assert "z" not in ALPHABET["french"]
    # estonian is an explicit Set, includes everything listed (:424)
    assert "ü" in ALPHABET["estonian"]
    assert "z" not in ALPHABET["estonian"]
    # urdu range excludes U+06D2 (:434)
    assert "ۑ" in ALPHABET["urdu"]
    assert "ے" not in ALPHABET["urdu"]
    # tamil 0x11FC0.toChar truncation bug -> Greek Extended range (:431)
    assert "῀" in ALPHABET["tamil"]
    assert "῿" not in ALPHABET["tamil"]  # range end-exclusive


def test_blocked_languages_are_dead():
    # Blocked.mayContain is always false for non-empty input (:395-399)
    for lang in DEAD_LANGUAGES:
        assert not may_contain(lang, "a")
        assert not may_contain(lang, "abc")
        assert split_words("plain ascii text", lang) == []


def test_persian_arabic_same_alphabet():
    assert ALPHABET["persian"] == ALPHABET["arabic"]  # :271,276


def test_norwegian_shared():
    assert ALPHABET["bokmål"] == ALPHABET["nynorsk"]  # :288-289


def test_hyphen_fusion():
    # '-' deleted by filter before split (Language.scala:88-89)
    assert split_words("Well-known state-of-the-art", "english") == [
        "wellknown", "stateoftheart",
    ]


def test_apostrophe_word_dropped_by_alphabet_gate():
    # apostrophe survives the filter but is in NO alphabet -> word dropped (:90)
    assert split_words("don't stop", "english") == ["stop"]


def test_whole_word_alphabet_gate():
    # single out-of-alphabet char kills the word (:373-374)
    assert split_words("size matters", "english") == ["matters"]  # 'z'!
    assert split_words("café food", "english") == ["food"]  # é not english
    assert split_words("café food", "french") == ["café", "food"]


def test_unicode_space_quirk():
    # U+2000 survives the filter (Java isWhitespace) but Java regex \s is
    # ASCII-only -> "foo bar" stays one token, then fails the gate.
    assert split_words("foo bar", "english") == []
    assert split_words("foo bar", "english") == ["foo", "bar"]
    # NBSP is NOT Java whitespace -> deleted by the filter -> fused token
    assert split_words("foo bar", "english") == ["foobar"]


def test_digits_and_symbols_removed():
    assert split_words("abc123 def!", "english") == ["abc", "def"]


def test_per_char_tokenizer():
    # WhitespaceIgnored (Language.scala:407-413): one token per valid char
    assert split_words("日本語 test", "japanese") == ["日", "本", "語"]
    assert split_words("日本語 test", "chinese") == ["日", "本", "語"]
    # Korean accepts HANGUL and HAN (:267)
    assert split_words("한국 語", "korean") == ["한", "국", "語"]
    # Thai is Explicit + per-char (:266); tone marks are Mn -> not letters
    assert split_words("ไทย", "thai") == ["ไ", "ท", "ย"]


def test_cjk_ignored_by_wordwise_languages():
    assert split_words("日本語 hello", "english") == ["hello"]


def test_empty_and_whitespace_only():
    for lang in ("english", "japanese"):
        assert split_words("", lang) == []
        assert split_words("   \t\n", lang) == []


def test_axiom_insert_and_gate():
    v = Vocabulary()
    assert v.load_labeled("english", "hello world") == ["hello", "world"]
    assert v.entries["english"]["hello"] == (1.0, True)
    # gate: no token known for french -> contributes nothing (:60-64)
    assert v.load_nonlabeled("french", "bonjour monde") == []
    # gate passes when >=1 token known; unseen tokens become 0.0 inductions
    words = v.load_nonlabeled("english", "hello stranger")
    assert words == ["hello", "stranger"]
    assert v.entries["english"]["stranger"] == (0.0, False)


def test_classify_winner_and_threshold():
    v = Vocabulary()
    v.load_labeled("english", "the quick brown fox")
    v.load_labeled("french", "le renard brun rapide")
    res = v.classify("the quick fox", adjust=False)
    lang, score = res.winner()
    assert lang == "english" and score == 3.0
    # all-unknown sample: every language gated out, max score 0.0 <= 0.0001
    res2 = v.classify("xylophone", adjust=False)  # 'x','y' ok but unknown word
    assert res2.winner()[0] is None


def test_mean_adjust_threshold_and_math():
    # n > 6 required (Language.scala:185,255)
    v = Vocabulary()
    v.load_labeled("english", "aa bb cc dd ee ff gg")
    # classify 7 tokens: 6 known axioms + 1 unknown -> n=7 > 6 -> adjust
    v.classify("aa bb cc dd ee ff hh")
    # total = 6.0, n = 7, mean = 6/7; induction hh: (0 + 6/7)/2
    assert v.entries["english"]["hh"] == ((0.0 + 6.0 / 7.0) / 2.0, False)
    # axioms unchanged
    assert v.entries["english"]["aa"] == (1.0, True)


def test_mean_adjust_not_applied_below_threshold():
    v = Vocabulary()
    v.load_labeled("english", "aa bb cc dd ee")
    v.classify("aa bb cc dd ee ff")  # n = 6, NOT > 6
    assert v.entries["english"]["ff"] == (0.0, False)


def test_mean_adjust_duplicates_compound():
    # duplicate tokens share one entry; sequential adjustment compounds
    v = Vocabulary()
    v.load_labeled("english", "aa bb cc dd ee ff")
    v.classify("aa bb cc dd ee ff gg gg")  # n=8, total=6.0, mean=0.75
    # gg adjusted twice: 0 -> 0.375 -> (0.375+0.75)/2 = 0.5625
    assert v.entries["english"]["gg"][0] == 0.5625


def test_mean_adjust_convergence_trace():
    # the reference's own worked example (Language.scala:229-233):
    # two words at 0.25/0.75 converge toward the midpoint.
    v = Vocabulary()
    v.entries["english"]["hello"] = (0.25, False)
    v.entries["english"]["world"] = (0.75, False)
    total, n = 1.0, 2
    mean = total / n
    h, w = 0.25, 0.75
    h, w = (h + mean) / 2, (w + mean) / 2
    assert (h, w) == (0.375, 0.625)


def test_induction_inserted_for_all_gated_languages():
    # inductions materialize for every gated language, not just the winner
    v = Vocabulary()
    v.load_labeled("english", "common word")
    v.load_labeled("dutch", "common woord")
    v.classify("common mystery")
    assert "mystery" in v.entries["english"]
    assert "mystery" in v.entries["dutch"]


def test_train_semi_supervised_deterministic():
    rows = [("english", f"hello world sample {i}") for i in range(10)]
    rows += [("french", f"bonjour le monde échantillon {i}") for i in range(10)]
    v1, o1 = train_semi_supervised(rows, 0.3, seed=42)
    v2, o2 = train_semi_supervised(rows, 0.3, seed=42)
    assert o1 == o2
    assert v1.rows() == v2.rows()
    assert len(o1) == 6  # int(20 * 0.3)


def test_semi_supervised_accuracy_sanity():
    """EP-2 end-to-end on the 24-language fixture corpus: the reference
    algorithm should classify the held-out split well (the runtime fail-rate
    printout is the reference's only correctness signal,
    TrainingResult.scala:45-56)."""
    from languagedetection_spark.fixtures.generate import gen_labeled_corpus

    rows = [(lang, text) for text, lang, _ in gen_labeled_corpus()]
    _v, outcomes = train_semi_supervised(rows, 0.3, seed=42)
    # reference semantics: no-winner rows count in neither bucket
    rights = sum(1 for t, p, _ in outcomes if p is not None and p == t)
    wrongs = sum(1 for t, p, _ in outcomes if p is not None and p != t)
    fail_rate = wrongs / (rights + wrongs)
    assert fail_rate < 0.15, fail_rate
    # dead languages never win (Blocked bug, Language.scala:395-399)
    assert all(p not in ("indonesian", "latin") for _, p, _ in outcomes)
