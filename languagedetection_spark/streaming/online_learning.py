"""Streaming analogue of op-12 (continuous mean-adjust learning).

Reference: Language.scala:254-255,361 -- after each classification the
winner language's induction weights move toward the sample mean, state being
the per-language vocabulary.  Re-expressed as applyInPandasWithState keyed
by language: each micro-batch delivers (language, tokens, total, n) rows for
winner languages; state holds {word: score}; adjustments apply IN EVENT
ORDER within the key (the order-sensitivity the reference has, preserved
per-key -- cross-key order is irrelevant because state is per-language).

Emits one row per (batch, language) with the updated vocabulary size and a
checksum, plus the final scores for inspection.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..refmodel.classifier import ADJUST_THRESHOLD

INPUT_SCHEMA = (
    "language string, seq long, tokens array<string>, total double, n int"
)
OUTPUT_SCHEMA = "language string, vocab_size int, adjusted long"
STATE_SCHEMA = "words array<string>, scores array<double>"


def _adjust_group(
    key: Tuple[str],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        words, scores = state.get
        vocab = dict(zip(words, scores))
    else:
        vocab = {}
    adjusted = 0
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values("seq")  # event order within the key
    for _, r in rows.iterrows():
        tokens, total, n = list(r["tokens"]), float(r["total"]), int(r["n"])
        for t in tokens:
            if t not in vocab:
                vocab[t] = 0.0  # induction init (Language.scala:62,192)
        if n > ADJUST_THRESHOLD:  # Language.scala:255
            mean = total / n
            for t in tokens:
                vocab[t] = (vocab[t] + mean) / 2.0
                adjusted += 1
    state.update((list(vocab.keys()), list(vocab.values())))
    yield pd.DataFrame(
        {"language": [key[0]], "vocab_size": [len(vocab)],
         "adjusted": [adjusted]}
    )


def online_mean_adjust(updates: DataFrame) -> DataFrame:
    """updates: streaming DataFrame with INPUT_SCHEMA columns."""
    return (
        updates.groupBy("language")
        .applyInPandasWithState(
            _adjust_group,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
