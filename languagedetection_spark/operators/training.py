"""Distributed semi-supervised training fold (EP-2, SURVEY §3/§7 item 8).

The reference trains ONLINE: each classification mutates the vocabulary the
next one reads (Language.scala:335-341), which is inherently sequential.
This operator makes it distributable with micro-batch synchronous updates:

1. axioms are loaded from the labeled split (distributed explode/gate),
2. the unlabeled stream is globally ordered by (order_cols),
3. per micro-batch: every sample is classified AGAINST THE BATCH-START
   VOCABULARY SNAPSHOT in parallel (one broadcast, one map-only job,
   returning winner/tokens/total/n per sample),
4. the driver applies the mean-adjust updates IN SAMPLE ORDER to the
   vocabulary dict (cheap: model-sized state), then re-broadcasts.

``batch_size=1`` reproduces the reference fold EXACTLY (each sample sees
every prior update -- verified against the pure oracle).  Larger batches
trade fidelity for parallelism: within a batch, samples don't see each
other's updates (batch-synchronous approximation, the standard
parameter-server trade).  Convergence-sensitive users pick the batch size;
the default favors throughput.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

from ..refmodel.alphabets import LANGUAGES
from ..refmodel.classifier import ADJUST_THRESHOLD, Vocabulary
from ..refmodel.tokenizer import split_words


def _classify_batch_distributed(
    spark: SparkSession, texts: list[tuple[int, str]], vocab_state: dict,
) -> list[tuple[int, str, list[str], float, int]]:
    """One map-only job: classify (seq, text) rows against a frozen snapshot.
    Returns (seq, winner_lang, winner_tokens, total, n) per sample."""
    bc = spark.sparkContext.broadcast(vocab_state)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        state = bc.value
        for pdf in batches:
            out = {"seq": [], "winner": [], "tokens": [], "total": [],
                   "n": []}
            for seq, text in zip(pdf["seq"], pdf["text"]):
                best_lang, best_score, best_tokens = None, float("-inf"), []
                for lang in LANGUAGES:
                    vocab = state.get(lang, {})
                    tokens = split_words(
                        text if isinstance(text, str) else "", lang
                    )
                    if tokens and any(t in vocab for t in tokens):
                        score = 0.0
                        for t in tokens:  # sequential, reference order
                            score += vocab.get(t, (0.0, False))[0]
                    else:
                        tokens, score = [], 0.0
                    if score > best_score or (
                        score == best_score
                        and best_lang is not None and lang < best_lang
                    ):
                        best_lang, best_score, best_tokens = (
                            lang, score, tokens
                        )
                out["seq"].append(seq)
                out["winner"].append(best_lang)
                out["tokens"].append(best_tokens)
                out["total"].append(best_score)
                out["n"].append(len(best_tokens))
            yield pd.DataFrame(out)

    df = spark.createDataFrame(texts, "seq long, text string")
    res = df.repartition(spark.sparkContext.defaultParallelism).mapInPandas(
        run,
        schema="seq long, winner string, tokens array<string>, "
               "total double, n int",
    ).collect()
    bc.unpersist()
    return sorted(
        ((r["seq"], r["winner"], list(r["tokens"]), r["total"], r["n"])
         for r in res),
        key=lambda t: t[0],
    )


def train_fold_distributed(
    spark: SparkSession,
    labeled: list[tuple[str, str]],
    unlabeled: list[tuple[str, str]],
    batch_size: int = 256,
) -> Vocabulary:
    """labeled/unlabeled: ordered (language_or_none, text) rows.  For
    unlabeled rows the language element is the ground-truth label (unused by
    training, kept for caller bookkeeping).  Returns the final Vocabulary.

    batch_size=1 == the reference's per-sample online fold, bit-for-bit
    (tests/test_training_fold.py); larger batches are batch-synchronous.
    """
    v = Vocabulary()
    for lang, text in labeled:
        v.load_labeled(lang, text)

    texts = [(i, text) for i, (_lang, text) in enumerate(unlabeled)]
    for start in range(0, len(texts), batch_size):
        chunk = texts[start:start + batch_size]
        results = _classify_batch_distributed(spark, chunk, v.entries)
        # apply updates in sample order (Language.scala:350-364 semantics:
        # inductions for ALL gated languages, then winner mean-adjust) --
        # NOTE: with batch_size > 1 only the winner-language inductions are
        # shipped back (the gate results of non-winning languages are
        # recomputed driver-side to stay faithful)
        for (seq, winner, tokens, total, n), (_i, text) in zip(
            results, chunk
        ):
            # faithful per-sample mutation against the CURRENT state
            for lang in LANGUAGES:
                v.load_nonlabeled(lang, text)
            if n > ADJUST_THRESHOLD:
                vocab = v.entries[winner]
                mean = total / n
                for t in tokens:
                    score, is_axiom = vocab[t]
                    if not is_axiom:
                        vocab[t] = ((score + mean) / 2.0, False)
    return v
