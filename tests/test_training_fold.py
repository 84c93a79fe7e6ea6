"""Distributed EP-2 training fold: batch_size=1 must equal the pure oracle
fold exactly; larger batches stay structurally sane."""

from languagedetection_spark.operators.training import train_fold_distributed
from languagedetection_spark.refmodel.classifier import Vocabulary


def _small_corpus(oracle_model):
    _v, _tm, rows = oracle_model
    labeled = rows[:120]
    unlabeled = rows[120:160]
    return labeled, unlabeled


def _oracle_fold(labeled, unlabeled):
    v = Vocabulary()
    for lang, text in labeled:
        v.load_labeled(lang, text)
    for _lang, text in unlabeled:
        v.classify(text, adjust=True)
    return v


def test_batch_size_1_equals_oracle(spark, oracle_model):
    labeled, unlabeled = _small_corpus(oracle_model)
    gold = _oracle_fold(labeled, unlabeled)
    got = train_fold_distributed(spark, labeled, unlabeled, batch_size=1)
    assert got.rows() == gold.rows()


def test_larger_batches_approximate(spark, oracle_model):
    labeled, unlabeled = _small_corpus(oracle_model)
    gold = _oracle_fold(labeled, unlabeled)
    got = train_fold_distributed(spark, labeled, unlabeled, batch_size=16)
    gold_rows = {(l, w): (s, a) for l, w, s, a in gold.rows()}
    got_rows = {(l, w): (s, a) for l, w, s, a in got.rows()}
    # same vocabulary membership and axiom flags; scores may differ only on
    # inductions touched by intra-batch staleness
    assert set(gold_rows) == set(got_rows)
    assert all(gold_rows[k][1] == got_rows[k][1] for k in gold_rows)
    diffs = sum(
        1 for k in gold_rows if abs(gold_rows[k][0] - got_rows[k][0]) > 1e-12
    )
    assert diffs <= len(gold_rows) * 0.2  # approximation, not divergence
