"""Physical-plan hygiene: the plans must be the ones we'd want at 100 TB --
filters pushed into the parquet scan, columns pruned, small sides broadcast,
and the scoring path shuffle-free.  (`.explain("formatted")` iterated until
right, then pinned here.)"""

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(autouse=True)
def _cache_clean(spark):
    """Plan pins must be cache-independent: Spark's CacheManager matches by
    logical plan, so a DataFrame persisted by an EARLIER test (e.g.
    bm25_topk's tf posting list, plan-identical to inverted_index's) gets
    silently substituted as an InMemoryRelation and changes the explain
    string these tests assert on."""
    spark.catalog.clearCache()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


SF = "/root/testdata/sf0.001"


def test_filter_pushdown_and_column_pruning(spark):
    df = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .filter(F.col("l_shipdate") <= "1998-09-02")
        .select("l_orderkey", "l_quantity")
    )
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # pruned read schema: only the 3 referenced columns reach the scan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema


def test_small_dims_are_broadcast(spark):
    from languagedetection_spark.entry_queries import revenue_by_nation

    plan = _plan(revenue_by_nation(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_classify_vocab_join_is_broadcast(spark):
    from languagedetection_spark.entry_queries import classify_relational

    plan = _plan(classify_relational(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_minhash_signatures_map_only(spark):
    """The LSH signature pass must stay map-only: scan -> ArrowEval, no
    Exchange (the round-2 one-md5-per-shingle kernel kept the r1 shape)."""
    from languagedetection_spark.operators.dedup import minhash_signatures_df

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(minhash_signatures_df(docs))
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


def test_components_round_shuffles_pairs_not_corpus(spark):
    """One label-propagation round shuffles the (pruned) pair list and the
    label table only -- no scan of the documents table appears in it."""
    from languagedetection_spark.operators.dedup import dedup_components_df

    nodes = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame(
        [(0, 1), (2, 3)], "doc_a long, doc_b long"
    )
    out = dedup_components_df(nodes, pairs)
    plan = _plan(out)
    # the result is a UNION of (checkpointed propagated labels + one size
    # window) and (nodes LEFT ANTI touched -> singletons): localCheckpoint
    # guarantees bounded lineage (no per-round join chain survives), and
    # singletons are attached once, outside the iteration
    assert plan.count("Scan ExistingRDD") <= 3  # labels, nodes, edges
    assert "Window" in plan
    assert "LeftAnti" in plan


def test_quality_pipeline_is_shuffle_free(spark, fixture_dir, oracle_model):
    from languagedetection_spark.functions.kernels import FilterModel
    from languagedetection_spark.functions.udfs import broadcast_model
    from languagedetection_spark.operators.quality_filter import quality_filter

    v, tm, _ = oracle_model
    bc = broadcast_model(spark, FilterModel.from_vocabulary(v, tm))
    df = spark.read.parquet(os.path.join(fixture_dir, "transcripts.parquet"))
    plan = _plan(quality_filter(df, bc))
    # map-only: scan -> ColumnarToRow -> MapInPandas; NO Exchange
    assert "Exchange" not in plan
    assert "MapInPandas" in plan
    assert "FileScan parquet" in plan


def test_salted_path_has_exactly_one_exchange(spark, fixture_dir,
                                              oracle_model):
    from languagedetection_spark.functions.kernels import FilterModel
    from languagedetection_spark.functions.udfs import broadcast_model
    from languagedetection_spark.operators.quality_filter import quality_filter
    from languagedetection_spark.plans.partitioning import salted_repartition

    v, tm, _ = oracle_model
    bc = broadcast_model(spark, FilterModel.from_vocabulary(v, tm))
    df = spark.read.parquet(os.path.join(fixture_dir, "transcripts.parquet"))
    plan = _plan(quality_filter(salted_repartition(df, 8), bc))
    assert plan.count("Exchange") == 1  # the salt shuffle, nothing else


def test_kept_turns_filter_reaches_scan_side(spark, fixture_dir,
                                             oracle_model):
    """keep-filter sits directly above the UDF (it cannot cross a Python
    UDF, but nothing else is between them)."""
    from languagedetection_spark.functions.kernels import FilterModel
    from languagedetection_spark.functions.udfs import broadcast_model
    from languagedetection_spark.operators.quality_filter import (
        kept_turns, quality_filter,
    )

    v, tm, _ = oracle_model
    bc = broadcast_model(spark, FilterModel.from_vocabulary(v, tm))
    df = spark.read.parquet(os.path.join(fixture_dir, "transcripts.parquet"))
    opt = _optimized(kept_turns(quality_filter(df, bc)))
    assert opt.index("Filter") < opt.index("MapInPandas")


def test_aqe_skew_join_engages_on_skewed_key(spark):
    """VERDICT r2 ask #6: the sort-merge-join paths (accuracy_metrics,
    dedup_components class) rely on AQE to split a hot key at runtime.
    Pin that OptimizeSkewedJoin actually ENGAGES on a skewed fixture --
    one key holding ~90% of the rows -- with the thresholds scaled down
    to test size.  The marker is Spark's own 'skew=true' flag on the SMJ
    node in the final adaptive plan."""
    import pyspark.sql.functions as F

    conf = spark.conf
    saved = {k: conf.get(k) for k in (
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
        "spark.sql.shuffle.partitions",
    )}
    try:
        conf.set("spark.sql.adaptive.skewJoin"
                 ".skewedPartitionThresholdInBytes", "16KB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.shuffle.partitions", "8")
        # two non-obvious preconditions, found the hard way:
        # 1. the pad must be INCOMPRESSIBLE -- AQE's partition sizes are
        #    compressed map-output bytes, so a constant pad compresses to
        #    nothing and no partition ever crosses the skew threshold;
        # 2. the join output must NOT feed a groupBy on the join key --
        #    OptimizeSkewedJoin refuses to split a partition whose
        #    hash-distribution a downstream operator still requires.
        pad = F.concat(
            F.md5(F.col("id").cast("string")),
            F.md5((F.col("id") + 1).cast("string")),
            F.md5((F.col("id") + 2).cast("string")),
        )
        hot = spark.range(30_000).select(
            (F.col("id") % 100).alias("k"), pad.alias("pa")
        ).withColumn("k", F.when(F.col("k") < 90, 0).otherwise(F.col("k")))
        dim = spark.range(100).select(
            F.col("id").alias("k"),
            F.md5(F.col("id").cast("string")).alias("pb"))
        joined = hot.join(dim, "k").agg(
            F.sum(F.length("pa") + F.length("pb")).alias("s"))
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
        assert "skewed" in plan  # the AQEShuffleRead actually split it
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_normalize_text_is_map_only(spark):
    """The normalization kernel is the pipeline's first stage at 100 TB:
    it must stay a pure scan -> mapInPandas plan with zero exchanges."""
    from languagedetection_spark.entry_queries import normalize_text

    plan = _plan(normalize_text(spark, SF))
    assert "Exchange" not in plan, plan
    assert "FlatMapsInPandas" in plan or "MapInPandas" in plan


def test_new_aggregate_queries_use_partial_aggregation(spark):
    """inverted_index / doc_char_entropy shuffle ONLY pre-aggregated rows:
    the plan must show a partial HashAggregate below each exchange (the
    map-side combine that keeps shuffle volume vocab-sized at scale) and
    no more than the expected exchanges."""
    from languagedetection_spark.entry_queries import (
        doc_char_entropy,
        inverted_index,
    )

    for fn, max_ex in ((inverted_index, 2), (doc_char_entropy, 2)):
        df = fn(spark, SF)
        df.count()
        plan = _plan(df)
        assert plan.count("Exchange") <= max_ex, plan
        assert "partial_count" in plan or "partial" in plan.lower(), plan


def test_cms_sketch_is_broadcast_and_partially_aggregated(spark):
    """heavy_hitters' count-min sketch must (a) reach the probe join as a
    BroadcastExchange -- it is <= 3x1024 rows by construction, independent
    of corpus size -- and (b) be built with map-side partial aggregation,
    so the shuffle carries at most 3072 rows per input partition."""
    from languagedetection_spark.entry_queries import heavy_hitters

    df = heavy_hitters(spark, SF)
    df.count()
    plan = _plan(df)
    assert "BroadcastExchange" in plan, plan
    assert "partial_count" in plan or "partial" in plan.lower(), plan


def test_winnow_fingerprints_map_only(spark):
    """Winnowing fingerprints are computed row-locally -- nothing shuffles
    until the fp-keyed candidate join."""
    from languagedetection_spark.operators.dedup import (
        winnow_fingerprints_df,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(winnow_fingerprints_df(docs))
    assert "Exchange" not in plan, plan


def test_pq_adc_scan_is_broadcast_map_only(spark):
    """The PQ ADC scan is the 100 TB hot path: encoded database vectors
    stream map-side against broadcast-literal codebooks and a BROADCAST
    query set -- no sort-merge join; the only exchange is the per-query
    top-k window shuffle."""
    from languagedetection_spark.entry_queries import ann_pq_topk

    plan = _plan(ann_pq_topk(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_ivfpq_scan_joins_on_cell_no_smj(spark):
    """The IVF-PQ candidate scan is a cell-keyed equi-join against the
    broadcast query set (the prune that makes a 100 TB codes table
    partition-prunable by cell) -- never a sort-merge join."""
    from languagedetection_spark.entry_queries import ann_ivfpq_topk

    plan = _plan(ann_ivfpq_topk(spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_bloom_decontaminate_probe_is_joinless(spark):
    """The Bloom probe replaces the benchmark-shingle join with k
    substring lookups into a compiled literal mask: the corpus-side plan
    must contain NO join operator of any kind -- only the shingle
    distinct and the per-doc aggregation shuffle."""
    from languagedetection_spark.entry_queries import bloom_decontaminate

    plan = _plan(bloom_decontaminate(spark, SF))
    assert "Join" not in plan, plan


def test_doc_chunks_is_shuffle_free(spark):
    """Chunking is a pure map-side explode: scan -> filter -> generate --
    zero exchanges at any corpus size."""
    from languagedetection_spark.entry_queries import doc_chunks

    plan = _plan(doc_chunks(spark, SF))
    assert "Exchange" not in plan, plan
    assert "Generate" in plan, plan


def test_segment_dedup_no_cross_joins(spark):
    """Segment dedup shuffles on the segment text (keeper election +
    membership probe) and on doc_id (reassembly) -- equi-joins only,
    never a nested-loop/cartesian product."""
    from languagedetection_spark.entry_queries import segment_dedup

    plan = _plan(segment_dedup(spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_strided_seed_rank_distributed_and_exact(spark):
    """r3 VERDICT "what's wrong" #3: k-means/PQ seed ranking used a global
    row_number() window, which Spark executes as ONE task holding the whole
    vector table.  Pin the replacement two-pass rank on both axes:

    * plan: no SinglePartition exchange anywhere in the rank stage;
    * value: seeds bit-identical to the global-window formulation on a
      SPARSE, shuffled vec_id fixture (the helper must not assume dense ids).
    """
    import random

    from pyspark.sql import Window as W

    from languagedetection_spark.operators.similarity import (
        _strided_seed_rows,
    )

    rows = [
        (i * 7 + (i % 3), [i % 5, (i * 2) % 7, i % 11, 1])
        for i in range(101)
    ]
    rnd = random.Random(13)
    rnd.shuffle(rows)
    v = spark.createDataFrame(
        rows, "vec_id long, qv array<bigint>"
    ).repartition(7)

    plans: list = []
    stride, seeds = _strided_seed_rows(v, 8, _plan_out=plans)
    assert plans and "SinglePartition" not in plans[0], plans[0]

    wn = W.orderBy("vec_id")
    want = (
        v.select("vec_id", "qv", (F.row_number().over(wn) - 1).alias("rn"))
        .filter((F.col("rn") % stride == 0) & (F.col("rn") / stride < 8))
        .collect()
    )
    got = sorted((r["rn"], r["vec_id"], list(r["qv"])) for r in seeds)
    exp = sorted((r["rn"], r["vec_id"], list(r["qv"])) for r in want)
    assert got == exp
    assert len(got) == 8


def test_null_ids_dont_crash_bucketed_rank(spark, tmp_path):
    """ADVICE r4: a NULL vec_id/doc_id produced bucket=None and the
    driver-side sorted() over (bucket, count) tuples raised TypeError.
    NULL ids are off-domain (no defined rank/pack position): the seed
    ranker drops them, and sequence_packing pins doc_id IS NOT NULL on
    both engines."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from languagedetection_spark.entry_queries import sequence_packing
    from languagedetection_spark.operators.similarity import (
        _strided_seed_rows,
    )

    v = spark.createDataFrame(
        [(0, [1, 2]), (None, [3, 4]), (7, [5, 6]), (3, [0, 1])],
        "vec_id long, qv array<bigint>",
    )
    stride, seeds = _strided_seed_rows(v, 2)
    assert all(r["vec_id"] is not None for r in seeds) and seeds

    pq.write_table(
        pa.table({
            "doc_id": pa.array([1, None, 4], pa.int64()),
            "lang": ["en"] * 3,
            "source": ["src0"] * 3,
            "text": ["a b c", "d e", "f"],
        }),
        str(tmp_path / "documents.parquet"),
    )
    rows = {r["doc_id"]: r["start_off"]
            for r in sequence_packing(spark, str(tmp_path)).collect()}
    assert rows == {1: 0, 4: 3}   # NULL-id row excluded, offsets exact


def test_sequence_packing_no_single_partition(spark):
    """The packing prefix scan is hierarchical (bucketed by doc_id range +
    broadcast offsets), never a corpus-wide single-task window sort."""
    from languagedetection_spark.entry_queries import sequence_packing

    plan = _plan(sequence_packing(spark, SF))
    assert "SinglePartition" not in plan, plan


def test_r4_query_plans_scale_shapes(spark):
    """The r4 batch's load-bearing plan shapes:

    * ann_hard_negatives -- the query side must broadcast into the
      inequality join (BroadcastNestedLoopJoin), never a CartesianProduct
      or a sort-merge of the corpus against itself;
    * vocab_drift_psi -- the (|langs| x 1024)-bounded histogram must reach
      the domain-completion join as a BroadcastExchange (derived DF:
      Catalyst has no stats, the operator pins it) and nothing sort-merges;
    * token_budget_select -- the admission window partitions by source:
      no SinglePartition exchange anywhere (a global-sort window here is
      exactly the funnel the r3 verdict flagged in sequence_packing);
    * user_retention_cohorts -- pure aggregate+join plan, zero windows;
    * funnel_conversion -- one user-keyed agg + the 1-row global rollup:
      at most two exchanges, with map-side partial aggregation.
    """
    from languagedetection_spark.entry_queries import (
        ann_hard_negatives,
        funnel_conversion,
        token_budget_select,
        user_retention_cohorts,
        vocab_drift_psi,
    )

    plan = _plan(ann_hard_negatives(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan

    df = vocab_drift_psi(spark, SF)
    df.count()
    plan = _plan(df)
    assert "BroadcastExchange" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    spark.catalog.clearCache()

    plan = _plan(token_budget_select(spark, SF))
    assert "SinglePartition" not in plan, plan

    plan = _plan(user_retention_cohorts(spark, SF))
    assert "Window" not in plan, plan

    plan = _plan(funnel_conversion(spark, SF))
    assert plan.count("Exchange") <= 2, plan
    assert "partial" in plan.lower(), plan


def test_r4_batch5_query_plans(spark):
    """Later r4 additions:

    * revenue_range_window -- the RANGE frame partitions by customer,
      never a SinglePartition global sort;
    * grouping_sets_revenue -- Expand + map-side partial aggregation
      (the rollup/cube shape, lattice-bounded output);
    * label_knn_agreement -- eval sample broadcast into the inequality
      join, never cartesian/SMJ."""
    from languagedetection_spark.entry_queries import (
        grouping_sets_revenue,
        label_knn_agreement,
        revenue_range_window,
    )

    plan = _plan(revenue_range_window(spark, SF))
    assert "SinglePartition" not in plan, plan

    plan = _plan(grouping_sets_revenue(spark, SF))
    assert "Expand" in plan, plan
    assert "partial" in plan.lower(), plan

    plan = _plan(label_knn_agreement(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # r5: the broadcast side must be the FIXED-K md5-rank sample, not a
    # corpus-proportional filter (VERDICT r4 what's-wrong #1).  Spark
    # plans the intermediate ORDER BY + LIMIT as TakeOrderedAndProject:
    # per-partition top-K, so only K rows per task reach the merge and
    # the BroadcastExchange input is K rows by construction.
    from languagedetection_spark.entry_queries import KNN_EVAL_K

    assert f"TakeOrderedAndProject(limit={KNN_EVAL_K}" in plan, plan


def test_conv_export_plan(spark):
    """conv_export (r5): the reassembly must add exactly one new shuffle —
    the conv-keyed aggregate — with collect_list combining MAP-SIDE
    (partial ObjectHashAggregate), and the kept-decision set must join
    back to documents by broadcast, never a doc x doc SMJ at the top."""
    from languagedetection_spark.entry_queries import conv_export

    plan = _plan(conv_export(spark, SF))
    assert "partial_collect_list" in plan, plan
    # top-level aggregate keyed on the conv column, not a global sort
    assert "SinglePartition" not in plan.split("SortMergeJoin")[0], plan
