"""Physical-plan hygiene: the plans must be the ones we'd want at 100 TB --
filters pushed into the parquet scan, columns pruned, small sides broadcast,
and the scoring path shuffle-free.  (`.explain("formatted")` iterated until
right, then pinned here.)"""

import os

from pyspark.sql import functions as F


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
