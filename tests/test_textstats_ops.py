"""Text-analysis operator unit tests (beyond the oracle contract):
algorithmic invariants the SQL side-by-side cannot express alone."""


def test_bpe_greedy_run_semantics(spark):
    """Greedy leftmost merging on identical-symbol runs is the classic
    BPE trap: 'aaaa' must become [aa, aa] and 'aaa' -> [aa, a] (never
    the overlapping middle pair).  Corpus: 'aaaa' x2 + 'aaa' x1 makes
    (a, a) the round-1 winner; round-2 pair counts pin the segmentation."""
    from languagedetection_spark.operators.textstats import (
        bpe_merge_rounds_df,
    )

    d = spark.createDataFrame(
        [(0, "aaaa aaa"), (1, "aaaa")], "doc_id long, text string")
    out = {(r["round"], r["l"], r["r"]): r["pair_count"]
           for r in bpe_merge_rounds_df(d, rounds=2, top=5).collect()}
    # round 1: 'aaaa' x2 has 3 (a,a) pairs each, 'aaa' has 2 -> 8 total
    assert out[(1, "a", "a")] == 8
    # round 2: 'aaaa' -> [aa, aa] (one (aa,aa) pair, x2 docs);
    # 'aaa' -> [aa, a] (one (aa,a) pair).  Overlapping merges would
    # leave different pairs entirely.
    assert out[(2, "aa", "aa")] == 2
    assert out[(2, "aa", "a")] == 1
    assert (2, "a", "a") not in out
