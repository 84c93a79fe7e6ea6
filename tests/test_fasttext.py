"""Tests for the hashed char-n-gram language detector."""

import pyarrow.parquet as pq

from languagedetection_spark.functions.fasttext import (
    HashedNgramModel, text_buckets,
)


def _model(oracle_model):
    _v, _tm, rows = oracle_model
    return HashedNgramModel.train(rows)


def test_buckets_deterministic():
    a = text_buckets("hello world")
    b = text_buckets("hello  world")  # normalization collapses spaces
    assert (a == b).all()
    assert len(text_buckets("")) == 0
    assert len(text_buckets("a")) == 0  # below the smallest n-gram


def test_fast_equals_slow(oracle_model):
    m = _model(oracle_model)
    _v, _tm, rows = oracle_model
    for lang, text in rows[:200]:
        fast = m.score_text(text)
        slow = m.score_text_slow(text)
        assert fast[0] == slow[0]
        assert abs(fast[1] - slow[1]) < 1e-12


def test_accuracy_on_fixture_corpus(oracle_model):
    """Char n-grams are a strong signal on the 24-language fixtures;
    dead-language texts (distinct ASCII) are also learnable here because
    this detector has NO alphabet gate -- that is the point of the second
    detector: it covers what the vocab classifier cannot."""
    m = _model(oracle_model)
    _v, _tm, rows = oracle_model
    correct = sum(1 for lang, text in rows if m.score_text(text)[0] == lang)
    assert correct / len(rows) > 0.9


def test_distributed_scorer_matches_local(spark, fixture_dir, oracle_model):
    import os

    from languagedetection_spark.functions.fasttext import langid_fasttext_df

    m = _model(oracle_model)
    bc = spark.sparkContext.broadcast(m)
    turns = pq.read_table(
        os.path.join(fixture_dir, "transcripts.parquet"),
        columns=["turn_idx", "text"],
    ).to_pylist()
    docs = spark.createDataFrame(
        [(i, r["text"]) for i, r in enumerate(turns)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: (r["ft_lang"], r["ft_score"])
           for r in langid_fasttext_df(docs.repartition(5), bc).collect()}
    for i, r in enumerate(turns):
        lang, score, _ = m.score_text(r["text"])
        assert out[i][0] == lang
        assert abs((out[i][1] or 0.0) - round(score, 6)) < 1e-9
