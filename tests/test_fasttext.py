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


def test_prior_corrected_kills_oov_bias():
    """Fully-OOV text: the plain score argmaxes to the least-negative
    backoff (smallest table) -- the NOTES round-1 gap -- while the
    prior-corrected score is exactly 0.0 for EVERY language, so the winner
    is just the alphabetic tie-break with pc_margin 0.0 (gateable).

    Uses a tiny model where the precondition (OOV grams hit NO trained
    bucket -- asserted below) holds; at fixture scale random 2^18-bucket
    collisions make 'exactly zero' unattainable by construction."""
    m = HashedNgramModel.train([
        ("english", "the quick brown fox jumps over the lazy dog"),
        ("french", "le renard brun rapide saute par dessus le chien"),
        ("spanish", "el rapido zorro marron salta sobre el perro perezoso"),
    ])
    oov = "☃☄★ ☆☇☈ ☉☊☋"
    oov_buckets = set(text_buckets(oov).tolist())
    for lang in m.langs:
        assert not oov_buckets & set(m.tables[lang][0].tolist())
    plain, pc = m.score_all(oov)
    # plain: degenerate argmax onto the smallest-table language
    smallest = min(m.langs, key=lambda lang: (-m.backoff[lang], lang))
    assert plain[0] == smallest
    assert abs(plain[1] - m.backoff[smallest]) < 1e-12
    # pc: no language is favored; margin is 0 -> downstream gates drop it
    assert pc[0] == m.langs[0]
    assert pc[1] == 0.0
    assert pc[2] == 0.0


def test_prior_corrected_accuracy_not_worse(oracle_model):
    m = _model(oracle_model)
    _v, _tm, rows = oracle_model
    plain_ok = pc_ok = 0
    for lang, text in rows:
        plain, pc = m.score_all(text)
        plain_ok += plain[0] == lang
        pc_ok += pc[0] == lang
    assert pc_ok / len(rows) > 0.9
    assert pc_ok >= plain_ok - len(rows) // 100  # within 1% of plain


def test_score_text_pc_is_shifted_plain(oracle_model):
    """pc(lang) tracks mean(lang) - backoff[lang] (delta-form vs shift-form
    agree to fp tolerance) and corrected scores are never negative."""
    m = _model(oracle_model)
    _v, _tm, rows = oracle_model
    for lang, text in rows[:50]:
        bs = text_buckets(text)
        means, pcs = m._mean_logps(bs)
        for i, name in enumerate(m.langs):
            assert pcs[i] >= 0.0  # logp >= backoff for every trained bucket
            assert abs(pcs[i] - (means[i] - m.backoff[name])) < 1e-9


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
    out = {r["doc_id"]: r
           for r in langid_fasttext_df(docs.repartition(5), bc).collect()}
    for i, r in enumerate(turns):
        plain, pc = m.score_all(r["text"])
        assert out[i]["ft_lang"] == plain[0]
        assert abs((out[i]["ft_score"] or 0.0) - round(plain[1], 6)) < 1e-9
        assert out[i]["ft_lang_pc"] == pc[0]
        assert abs((out[i]["ft_score_pc"] or 0.0) - round(pc[1], 6)) < 1e-9
        assert abs((out[i]["ft_margin_pc"] or 0.0) - round(pc[2], 6)) < 1e-9


def test_distributed_training_equals_local(spark, oracle_model):
    """train_hashed_ngram_distributed must be bit-identical to
    HashedNgramModel.train on the same (language, text) rows: same
    languages, bucket tables, log-probs, and backoffs."""
    import numpy as np

    from languagedetection_spark.functions.fasttext import (
        HashedNgramModel,
        train_hashed_ngram_distributed,
    )

    _v, _tm, rows = oracle_model
    gold = HashedNgramModel.train(rows)
    df = spark.createDataFrame(rows, "language string, text string")
    got = train_hashed_ngram_distributed(df.repartition(7))
    assert got.langs == gold.langs
    assert got.backoff == gold.backoff
    for lang in gold.langs:
        gb, gp = gold.tables[lang]
        hb, hp = got.tables[lang]
        assert np.array_equal(gb, hb)
        assert np.array_equal(gp, hp)


def test_distributed_training_registers_empty_bag_language(spark):
    """ADVICE r2: a language whose every text yields ZERO ngram buckets
    (e.g. a single 1-char text) must still be registered -- same langs,
    empty table, backoff log(alpha/alpha) = 0.0 -- identically to the
    local trainer, not silently dropped from the model."""
    import numpy as np

    from languagedetection_spark.functions.fasttext import (
        HashedNgramModel,
        train_hashed_ngram_distributed,
    )

    rows = [("empty", "a"), ("english", "hello world hello")]
    gold = HashedNgramModel.train(rows)
    df = spark.createDataFrame(rows, "language string, text string")
    got = train_hashed_ngram_distributed(df.repartition(3))
    assert gold.langs == ["empty", "english"]
    assert got.langs == gold.langs
    assert got.backoff == gold.backoff
    assert got.backoff["empty"] == 0.0
    for lang in gold.langs:
        gb, gp = gold.tables[lang]
        hb, hp = got.tables[lang]
        assert np.array_equal(gb, hb)
        assert np.array_equal(gp, hp)
    assert len(got.tables["empty"][0]) == 0
