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
    adjusted = _adjust_rows(vocab, pd.concat(list(pdfs), ignore_index=True))
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


def _adjust_rows(vocab: dict, rows: pd.DataFrame) -> int:
    """The shared op-12 micro-batch fold (Language.scala:62,192,254-255):
    seq-ordered induction inserts + mean-adjust when n > threshold."""
    adjusted = 0
    for _, r in rows.sort_values("seq").iterrows():
        tokens, total, n = list(r["tokens"]), float(r["total"]), int(r["n"])
        for t in tokens:
            if t not in vocab:
                vocab[t] = 0.0
        if n > ADJUST_THRESHOLD:
            mean = total / n
            for t in tokens:
                vocab[t] = (vocab[t] + mean) / 2.0
                adjusted += 1
    return adjusted


def online_mean_adjust_tws(updates: DataFrame) -> DataFrame:
    """Same operator on Spark 4.x's ``transformWithStateInPandas`` (the
    successor API to applyInPandasWithState): state is a typed ValueState
    holding the (words, scores) vocabulary; the fold logic is shared
    (``_adjust_rows``) so semantics are identical by construction.

    Requires ``google.protobuf`` (the TWS state-server protocol) and the
    RocksDB state store provider; raises ImportError with guidance when the
    protocol dependency is absent (it is not shipped in every environment —
    the applyInPandasWithState variant above has no such dependency)."""
    try:
        import google.protobuf  # noqa: F401  (TWS state protocol dep)
    except ImportError as e:
        raise ImportError(
            "transformWithStateInPandas needs the protobuf package for its "
            "state-server protocol (pip install protobuf) plus "
            "spark.sql.streaming.stateStore.providerClass="
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider; use online_mean_adjust "
            "(applyInPandasWithState) where protobuf is unavailable"
        ) from e
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle,
    )

    class MeanAdjustProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("vocab", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                words, scores = self._state.get()
                vocab = dict(zip(words, scores))
            else:
                vocab = {}
            pdfs = list(rows)
            adjusted = (
                _adjust_rows(vocab, pd.concat(pdfs, ignore_index=True))
                if pdfs else 0
            )
            self._state.update((list(vocab.keys()), list(vocab.values())))
            yield pd.DataFrame(
                {"language": [key[0]], "vocab_size": [len(vocab)],
                 "adjusted": [adjusted]}
            )

        def close(self) -> None:
            pass

    return (
        updates.groupBy("language")
        .transformWithStateInPandas(
            statefulProcessor=MeanAdjustProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
