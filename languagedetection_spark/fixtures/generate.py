"""Deterministic synthetic fixtures (seed=42) per FIXTURES.md -- no external
data.  Generates:

* per-language lexicons drawn from each language's own alphabet,
* the `labeled_corpus` table (text, language, iso639),
* the `transcripts` table (conv_id, turn_idx, role, text, tool, ts) with a
  skewed conv_id head, quality-rule triggers and PII patterns,

and writes them as Parquet via pyarrow (no Spark dependency, so the pure-
Python oracle tests can use the same fixtures).
"""

from __future__ import annotations

import datetime as dt
import random

from ..refmodel.alphabets import ALPHABET, ISO639, LANGUAGES, PER_CHAR_LANGUAGES
from ..refmodel.tokenizer import split_words

SEED = 42

# Dead languages still get *labeled rows* (FIXTURES.md §2 requires samples for
# them so tests can assert they are never predicted); their text is ASCII that
# no live language has in its vocabulary.
_DEAD_TEXT_CHARS = "bcdfghjklmnpqrstvw"


def _lexicon_for(language: str, rng: random.Random, size: int = 120) -> list[str]:
    """Deterministic per-language lexicon: words valid under the language's
    own alphabet (round-tripped through the reference tokenizer)."""
    alpha = sorted(ALPHABET[language])
    if not alpha:  # dead languages: distinct ASCII words (never match anything)
        out = []
        for _ in range(size):
            n = rng.randint(4, 9)
            out.append("".join(rng.choice(_DEAD_TEXT_CHARS) for _ in range(n)))
        return sorted(set(out))
    per_char = language in PER_CHAR_LANGUAGES
    words: set[str] = set()
    attempts = 0
    while len(words) < size and attempts < size * 60:
        attempts += 1
        n = rng.randint(1, 3) if per_char else rng.randint(3, 9)
        w = "".join(rng.choice(alpha) for _ in range(n))
        # round-trip through the reference tokenizer: every generated word
        # must survive filtering/gating for its own language
        toks = split_words(w, language)
        if per_char:
            if toks and "".join(toks) == w.lower():
                words.add(w.lower())
        elif toks == [w.lower()]:
            words.add(w.lower())
    return sorted(words)


def gen_lexicons(seed: int = SEED, size: int = 120) -> dict[str, list[str]]:
    rng = random.Random(seed)
    return {lang: _lexicon_for(lang, rng, size) for lang in LANGUAGES}


def _sample_text(lang: str, lex: list[str], rng: random.Random,
                 n_lo: int = 4, n_hi: int = 18) -> str:
    k = rng.randint(n_lo, n_hi)
    words = [rng.choice(lex) for _ in range(k)]
    if lang in PER_CHAR_LANGUAGES:
        return "".join(words)
    return " ".join(words)


def gen_labeled_corpus(
    seed: int = SEED, rows_per_lang: int = 40,
) -> list[tuple[str, str, str]]:
    """(text, language, iso639) rows -- FIXTURES.md §2."""
    rng = random.Random(seed + 1)
    lexicons = gen_lexicons(seed)
    rows: list[tuple[str, str, str]] = []
    for lang in LANGUAGES:
        lex = lexicons[lang]
        for _ in range(rows_per_lang):
            rows.append((_sample_text(lang, lex, rng), lang, ISO639[lang]))
    rng.shuffle(rows)
    return rows


# ---------------------------------------------------------------------------
# Transcripts
# ---------------------------------------------------------------------------

_ROLES = ["user", "assistant", "tool", "system"]
_TOOLS = ["search", "calculator", "browser", ""]

_PII_SNIPPETS = [
    "contact me at alice.smith@example.com please",
    "my ssn is 123-45-6789 thanks",
    "card 4111 1111 1111 1111 expires soon",
    "call +1 (555) 123-4567 now",
    "server at 192.168.10.25 is down",
    "see https://example.com/path?q=1 for details",
    "that frak of a gorram printer broke",
]


def gen_transcripts(
    seed: int = SEED,
    n_convs: int = 200,
    avg_turns: int = 10,
    skew_head: int = 3,
    skew_factor: int = 8,
) -> list[dict]:
    """Transcript rows per FIXTURES.md §1.  The first ``skew_head`` conv_ids
    own ``skew_factor``x the average turns (the skewed head that exercises
    salted repartitioning)."""
    rng = random.Random(seed + 2)
    lexicons = gen_lexicons(seed)
    live = [l for l in LANGUAGES]  # include dead-language text too
    rows: list[dict] = []
    t0 = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
    for ci in range(n_convs):
        conv_id = f"conv-{ci:08d}"
        n_turns = avg_turns * (skew_factor if ci < skew_head else 1)
        n_turns = max(1, int(rng.gauss(n_turns, n_turns * 0.2)))
        conv_lang = rng.choice(live)
        ts = t0 + dt.timedelta(hours=ci)
        for ti in range(n_turns):
            ts += dt.timedelta(seconds=rng.randint(1, 120))
            lang = conv_lang if rng.random() < 0.8 else rng.choice(live)
            r = rng.random()
            if r < 0.04:       # too_short trigger
                text = rng.choice(["", "ok", "ja", "??", "hm", "   "])
            elif r < 0.08:     # symbol_ratio trigger
                text = "".join(rng.choice("#$%&*+=<>/\\|~^") for _ in range(rng.randint(12, 40)))
            elif r < 0.12:     # repetition trigger
                w = rng.choice(lexicons[lang] or ["blah"])
                text = " ".join([w] * rng.randint(8, 16))
            elif r < 0.20:     # PII / toxicity trigger embedded in real text
                text = _sample_text(lang, lexicons[lang], rng, 3, 8) + " " + rng.choice(_PII_SNIPPETS)
            else:
                text = _sample_text(lang, lexicons[lang], rng)
            role = rng.choice(_ROLES)
            rows.append({
                "conv_id": conv_id,
                "turn_idx": ti,
                "role": role,
                "text": text,
                "tool": rng.choice(_TOOLS) if role == "tool" else "",
                "ts": ts,
            })
    return rows


def write_parquet_fixtures(out_dir: str, seed: int = SEED,
                           n_convs: int = 200, avg_turns: int = 10,
                           rows_per_lang: int = 40) -> dict[str, str]:
    """Materialize labeled_corpus + transcripts as Parquet under *out_dir*."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    corpus = gen_labeled_corpus(seed, rows_per_lang)
    corpus_t = pa.table({
        "text": [r[0] for r in corpus],
        "language": [r[1] for r in corpus],
        "iso639": [r[2] for r in corpus],
    })
    corpus_path = os.path.join(out_dir, "labeled_corpus.parquet")
    pq.write_table(corpus_t, corpus_path)

    turns = gen_transcripts(seed, n_convs, avg_turns)
    tr = pa.table({
        "conv_id": pa.array([r["conv_id"] for r in turns], pa.string()),
        "turn_idx": pa.array([r["turn_idx"] for r in turns], pa.int32()),
        "role": pa.array([r["role"] for r in turns], pa.string()),
        "text": pa.array([r["text"] for r in turns], pa.string()),
        "tool": pa.array([r["tool"] for r in turns], pa.string()),
        "ts": pa.array([r["ts"] for r in turns], pa.timestamp("us", tz="UTC")),
    })
    tr_path = os.path.join(out_dir, "transcripts.parquet")
    pq.write_table(tr, tr_path)
    return {"labeled_corpus": corpus_path, "transcripts": tr_path}
