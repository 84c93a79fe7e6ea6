"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship quality-filter pipeline on sf0.001;
``queries()`` / ``oracle_sql()`` expose the operator registry
(languagedetection_spark/entry_queries.py) for the DuckDB correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full quality-filter pipeline (langid -> perplexity ->
    heuristics -> scrub) over sf0.001 documents viewed as transcript turns.

    Model artifacts are built from the deterministic 24-language fixture
    corpus (seed=42) and broadcast; the scoring stage is map-only.
    """
    from pyspark.sql import functions as F

    from languagedetection_spark.fixtures.generate import gen_labeled_corpus
    from languagedetection_spark.functions.udfs import broadcast_model
    from languagedetection_spark.operators.quality_filter import quality_filter
    from languagedetection_spark.operators.training import (
        build_model_distributed,
    )
    from languagedetection_spark.plans.packaging import ship_package
    from languagedetection_spark.refmodel.alphabets import ISO_TO_LANGUAGE

    ship_package(spark.sparkContext)
    sf_dir = "/root/testdata/sf0.001"
    # model corpus: the 24-language fixture corpus (seed=42) PLUS the sf
    # documents' own labeled subset (source='src0'), so the flagship detects
    # languages in both domains.  Built DISTRIBUTED (explode/aggregate;
    # only model-sized aggregates reach the driver) -- the labeled subset
    # is corpus-proportional and must never be collected.
    fixture_corpus = spark.createDataFrame(
        [(lang, text) for text, lang, _iso in gen_labeled_corpus()],
        "language string, text string",
    )
    dim = spark.createDataFrame(
        sorted(ISO_TO_LANGUAGE.items()), "iso string, language string"
    )
    docs0 = spark.read.parquet(f"{sf_dir}/documents.parquet")
    labeled = (
        docs0.filter("source = 'src0'")
        .join(F.broadcast(dim), docs0.lang == dim.iso)
        .select("language", "text")
    )
    model = build_model_distributed(
        spark, fixture_corpus.unionAll(labeled)
    )
    bc = broadcast_model(spark, model)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    transcripts = docs.select(
        F.col("source").alias("conv_id"),
        F.col("doc_id").cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        "text",
        F.lit("").alias("tool"),
        F.current_timestamp().alias("ts"),
    )
    return quality_filter(transcripts, bc).select(
        "conv_id", "turn_idx", "lang", "lang_conf", "ppl", "keep",
        "drop_reason", "scrubbed_text",
    )


def _scoped(fn: Callable[[SparkSession, str], DataFrame]):
    """Release the PREVIOUS query's registered caches before building the
    next one (plans.cache_registry): by the time the driver invokes query
    N+1 it has collected query N's result, so at most one query's
    corpus-sized caches are ever live in the one-session full-registry
    replay — bounding executor storage AND the CacheManager cross-query
    plan-substitution hazard.  Internal cross-query calls use the unwrapped
    module functions and are unaffected."""
    import functools

    from languagedetection_spark.plans.cache_registry import release_all

    @functools.wraps(fn)
    def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
        release_all()
        return fn(spark, sf_dir)

    return wrapper


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    training-data ops).  Each callable takes (spark, sf_dir)."""
    from languagedetection_spark.entry_queries import QUERIES

    return {name: _scoped(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted entries are non-SQL-
    expressible ops checked rows-only by the driver)."""
    from languagedetection_spark.entry_queries import (
        ORACLE_SQL,
        _axiom_dist_goldens_sql,
        _fold_goldens_sql,
    )

    d = dict(ORACLE_SQL)
    # the two golden-fold oracles embed per-fixture golden rows: rebuild
    # them at CALL time (cached after the first build) so a testdata tree
    # regenerated after module import, or a non-default SPARK_GRAFT_SF_DIR
    # root, still gets freshly-validated goldens (ADVICE r2)
    d["mean_adjust_fold"] = _fold_goldens_sql()
    d["axiom_distribution"] = _axiom_dist_goldens_sql()
    return d
