"""Reference classifier/trainer semantics (ops 6-15 of SURVEY.md §2).

Reference: /root/reference/src/main/scala/Language.scala:45-64, 166-258,
322-364; TestResult.scala:32-34; TrainingResult.scala:17-24.

Replicated semantics:

* Axioms (labeled words): score pinned at 1.0, never adjusted
  (Language.scala:166-171).  ``loadLabeledData`` upserts -- later inserts
  overwrite (entries.update, Language.scala:47) but an axiom stays an axiom.
* Inductions (unlabeled words): created at score 0.0 via ``getOrElseUpdate``
  (Language.scala:62,185-192 -- the prior-equal-entry init at :192 is dead
  code because getOrElseUpdate only evaluates the default when absent).
* Existence gate: a language participates in a sample only if >=1 token is
  already in its vocabulary (Language.scala:60-64).  All gated languages
  insert inductions for every unseen token -- not just the winner.
* Score = sum of word scores IN TOKEN ORDER, duplicates counted per
  occurrence (Language.scala:353).
* Winner (for weight adjustment): argmax over all 24 languages
  (Language.scala:359-361).  The reference iterates a ``Set`` so ties are
  non-deterministic (SURVEY §2 op-10); we pin the deterministic tie-break
  (score desc, language name asc) and document the deviation.
* meanAdjust (Language.scala:254-255): only when the winner matched
  ``n > 6`` words; each induction word, in token order,
  ``w <- (w + total/n) / 2`` where ``total`` is the PRE-adjustment sum.
  Duplicate tokens share one entry, so repeated occurrences compound.
* TestResult snapshots are taken BEFORE adjustment (Language.scala:356).
* ``findWinner`` threshold: winner only if score > 0.0001
  (TestResult.scala:32-34).
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

from .alphabets import LANGUAGES, for_name
from .tokenizer import split_words

WINNER_THRESHOLD = 0.0001   # TestResult.scala:34
ADJUST_THRESHOLD = 6        # Language.scala:185 (adjust only when n > 6)


@dataclass
class ClassifyResult:
    """Snapshot of one classification (pre-adjustment), all 24 languages in
    declaration order -- the oracle analogue of ``TestResult``."""

    per_language: dict[str, tuple[float, list[str]]] = field(default_factory=dict)

    def winner(self) -> tuple[str | None, float]:
        """(language, score) with the pinned tie-break; language is None when
        the max score fails the > 0.0001 threshold (TestResult.scala:32-34)."""
        best_lang, best_score = None, float("-inf")
        for lang in LANGUAGES:
            score, _ = self.per_language[lang]
            if score > best_score or (score == best_score and best_lang is not None and lang < best_lang):
                best_lang, best_score = lang, score
        if best_score > WINNER_THRESHOLD:
            return best_lang, best_score
        return None, best_score

    def adjust_winner(self) -> str:
        """Language whose weights get adjusted (Language.scala:359-361) --
        NOT thresholded; the raw argmax with the pinned tie-break."""
        best_lang, best_score = None, float("-inf")
        for lang in LANGUAGES:
            score, _ = self.per_language[lang]
            if score > best_score or (score == best_score and best_lang is not None and lang < best_lang):
                best_lang, best_score = lang, score
        assert best_lang is not None
        return best_lang


class Vocabulary:
    """The mutable model state: per-language word -> (score, is_axiom).
    Oracle analogue of ``Language.entries`` (Language.scala:24)."""

    def __init__(self) -> None:
        self.entries: dict[str, dict[str, tuple[float, bool]]] = {
            lang: {} for lang in LANGUAGES
        }

    # -- op-6: supervised insert (Language.scala:45-48) ---------------------
    def load_labeled(self, language: str, text: str) -> list[str]:
        tokens = split_words(text, language)
        vocab = self.entries[language]
        for t in tokens:
            vocab[t] = (1.0, True)  # entries.update -- later rows overwrite
        return tokens

    # -- op-7: guarded unsupervised insert + lookup (Language.scala:60-64) --
    def load_nonlabeled(self, language: str, text: str) -> list[str]:
        tokens = split_words(text, language)
        vocab = self.entries[language]
        if any(t in vocab for t in tokens):
            for t in tokens:
                if t not in vocab:
                    vocab[t] = (0.0, False)  # induction init (:62,:192)
            return tokens
        return []

    # -- ops 7-12,15: classify driver (Language.scala:350-364) --------------
    def classify(self, sample: str, adjust: bool = True) -> ClassifyResult:
        result = ClassifyResult()
        for lang in LANGUAGES:
            words = self.load_nonlabeled(lang, sample)
            vocab = self.entries[lang]
            score = 0.0
            for t in words:  # sequential sum in token order (:353)
                score += vocab[t][0]
            result.per_language[lang] = (score, words)

        if adjust:
            win = result.adjust_winner()
            total, words = result.per_language[win]
            n = len(words)
            if n > ADJUST_THRESHOLD:  # Language.scala:255
                vocab = self.entries[win]
                mean = total / n
                for t in words:  # in token order; duplicates compound
                    score, is_axiom = vocab[t]
                    if not is_axiom:  # axioms NOOP (:168)
                        vocab[t] = ((score + mean) / 2.0, False)
        return result

    # -- frozen scoring: the production-filter path (SURVEY §7) -------------
    def score_frozen(self, sample: str) -> dict[str, tuple[float, list[str]]]:
        """Score *sample* against the FROZEN vocabulary -- no mutation.

        Semantically identical to ``classify(adjust=False)``'s snapshot
        (unseen tokens of gated languages score 0.0, exactly what a fresh
        induction would contribute), but inserts nothing.  Sums use
        ``math.fsum`` (exact, order-independent) so the distributed Spark
        kernel can reproduce them bit-for-bit regardless of batch layout.
        """
        import math as _math

        out: dict[str, tuple[float, list[str]]] = {}
        for lang in LANGUAGES:
            tokens = split_words(sample, lang)
            vocab = self.entries[lang]
            if tokens and any(t in vocab for t in tokens):
                score = _math.fsum(
                    vocab[t][0] if t in vocab else 0.0 for t in tokens
                )
                out[lang] = (score, tokens)
            else:
                out[lang] = (0.0, [])
        return out

    def winner_frozen(self, sample: str) -> tuple[str | None, float]:
        """Frozen-vocab winner with the pinned tie-break and the > 0.0001
        threshold (TestResult.scala:32-34)."""
        scores = self.score_frozen(sample)
        best_lang, best_score = None, float("-inf")
        for lang in LANGUAGES:
            score, _ = scores[lang]
            if score > best_score or (
                score == best_score and best_lang is not None and lang < best_lang
            ):
                best_lang, best_score = lang, score
        if best_score > WINNER_THRESHOLD:
            return best_lang, best_score
        return None, best_score

    def rows(self) -> list[tuple[str, str, float, bool]]:
        """Vocabulary as (language, word, score, is_axiom) rows, sorted."""
        out = []
        for lang in LANGUAGES:
            for word, (score, is_axiom) in self.entries[lang].items():
                out.append((lang, word, score, is_axiom))
        out.sort()
        return out


def classify_language(vocab: Vocabulary, sample: str) -> ClassifyResult:
    """Convenience wrapper matching ``Language.classifyLanguage`` (:350-364)."""
    return vocab.classify(sample, adjust=True)


def train_semi_supervised(
    rows: list[tuple[str, str]],
    unlabeled_ratio: float,
    seed: int | None = None,
) -> tuple[Vocabulary, list[tuple[str, str | None, float]]]:
    """EP-2 (Language.scala:335-341): shuffle, splitAt(len*ratio) ->
    (unlabeled, labeled); load labeled as axioms; classify unlabeled
    SEQUENTIALLY (order matters -- each classification mutates the vocab).

    *rows* are (language_name, text).  Unknown names are dropped upstream
    (op-1/2, Language.scala:309-314).  The reference shuffle is unseeded
    (Random.shuffle); ours takes a seed for reproducibility (documented
    deviation -- SURVEY §2 op-13).

    Returns (vocabulary, [(true_language, predicted_or_None, winner_score)]).
    """
    data = [(lang, text) for lang, text in rows if for_name(lang) is not None]
    if seed is not None:
        rng = random.Random(seed)
        data = data[:]
        rng.shuffle(data)
    cut = int(len(data) * unlabeled_ratio)
    unlabeled, labeled = data[:cut], data[cut:]

    vocab = Vocabulary()
    for lang, text in labeled:
        vocab.load_labeled(lang, text)

    outcomes: list[tuple[str, str | None, float]] = []
    for lang, text in unlabeled:
        res = vocab.classify(text, adjust=True)
        pred, score = res.winner()
        outcomes.append((lang, pred, score))
    return vocab, outcomes
