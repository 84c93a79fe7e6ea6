"""Stop-shingle guard in dedup_ngram_jaccard_df: the default cap must bound
candidate generation (quadratic-blowup protection at scale) while keeping
genuine near-duplicates (verdict r1 item 4)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _corpus(spark):
    # 40 docs that share ONLY one boilerplate shingle ("common stop shingle")
    # plus one genuine near-dup pair (100, 101) sharing many rare shingles.
    rows = [
        (i, f"common stop shingle u{i}a u{i}b u{i}c u{i}d u{i}e")
        for i in range(40)
    ]
    near = "rare alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows.append((100, near + " lambda"))
    rows.append((101, near + " omicron"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_guard_bounds_candidates_and_keeps_near_dups(spark):
    from languagedetection_spark.operators.dedup import dedup_ngram_jaccard_df

    docs = _corpus(spark)
    # threshold 0: output == verified candidate set, so row counts expose
    # candidate generation directly
    unguarded = dedup_ngram_jaccard_df(docs, threshold=0.0,
                                       max_shingle_freq=None).count()
    guarded_rows = dedup_ngram_jaccard_df(docs, threshold=0.0,
                                          max_shingle_freq=10).collect()
    guarded_pairs = {(r["doc_a"], r["doc_b"]) for r in guarded_rows}
    # boilerplate-only pairs: C(40,2) = 780 of them, all pruned by the guard
    assert unguarded >= 780 + 1
    assert guarded_pairs == {(100, 101)}
    # and the surviving pair's Jaccard uses ALL shingles (guard only applies
    # to candidate generation): 9 shared of (10 + 10 - 9... ) -- just assert
    # a sane positive value
    assert 0.0 < guarded_rows[0]["jaccard"] <= 1.0


def test_components_transitive_closure(spark):
    """Min-label propagation must produce the transitive closure: chain
    1-2, 2-3 merges into one cluster; 4-5 separate; 6 singleton."""
    from languagedetection_spark.operators.dedup import dedup_components_df

    nodes = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: (r["canonical_id"], r["cluster_size"])
        for r in dedup_components_df(nodes, pairs).collect()
    }
    assert got == {
        1: (1, 3), 2: (1, 3), 3: (1, 3),
        4: (4, 2), 5: (4, 2),
        6: (6, 1),
    }


def test_components_deep_chain_converges(spark):
    """A 16-node path graph needs multiple propagation rounds (diameter
    15): the early-exit loop must still reach the fixpoint."""
    from languagedetection_spark.operators.dedup import dedup_components_df

    n = 16
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    got = dedup_components_df(nodes, pairs).collect()
    assert all(r["canonical_id"] == 0 and r["cluster_size"] == n
               for r in got)
    assert len(got) == n


def test_components_ignore_unknown_pair_ids(spark):
    """Pairs referencing docs absent from the node set must not leak
    phantom ids into the output (nor merge through them)."""
    from languagedetection_spark.operators.dedup import dedup_components_df

    nodes = spark.createDataFrame([(1,), (2,), (3,)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 99), (99, 3)],  # 99 is not a node
        "doc_a long, doc_b long",
    )
    got = {
        r["doc_id"]: (r["canonical_id"], r["cluster_size"])
        for r in dedup_components_df(nodes, pairs).collect()
    }
    assert got == {1: (1, 2), 2: (1, 2), 3: (3, 1)}


def test_default_guard_is_on():
    import inspect

    from languagedetection_spark.operators.dedup import (
        MAX_SHINGLE_FREQ_DEFAULT,
        dedup_ngram_jaccard_df,
    )

    default = inspect.signature(
        dedup_ngram_jaccard_df
    ).parameters["max_shingle_freq"].default
    assert default == MAX_SHINGLE_FREQ_DEFAULT
    assert default is not None and default <= 1024
