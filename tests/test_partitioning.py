"""Quantitative skew evidence: the fixture transcripts have a skewed head
(3 conv_ids own ~10% of turns -- FIXTURES.md §1).  Salted repartitioning
must spread those conversations across partitions; plain repartition by
conv_id must not."""

import os

from pyspark.sql import functions as F


def _partition_sizes(df):
    return [
        r["n"] for r in df.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count("*").alias("n")).collect()
    ]


def test_salting_breaks_conv_skew(spark, fixture_dir):
    df = spark.read.parquet(os.path.join(fixture_dir, "transcripts.parquet"))
    from languagedetection_spark.plans.partitioning import salted_repartition

    n = df.count()
    head = (
        df.groupBy("conv_id").agg(F.count("*").alias("c"))
        .orderBy(F.desc("c")).first()
    )
    assert head["c"] > n / 60  # the generator's skewed head exists

    plain = df.repartition(8, "conv_id")
    salted = salted_repartition(df, 8, block_size=8)

    # the hot conversation lands in ONE partition unsalted, MANY salted
    hot = df.filter(F.col("conv_id") == head["conv_id"])
    hot_plain = hot.repartition(8, "conv_id")
    unsalted_parts = len(_partition_sizes(hot_plain))
    salted_parts = len(
        _partition_sizes(salted.filter(F.col("conv_id") == head["conv_id"]))
    )
    assert unsalted_parts == 1
    assert salted_parts >= 4

    # overall balance improves: max/mean partition ratio shrinks
    def imbalance(frame):
        sizes = _partition_sizes(frame)
        return max(sizes) / (sum(sizes) / len(sizes))

    assert imbalance(salted) <= imbalance(plain) + 1e-9


def test_stable_order_within_partitions(spark, fixture_dir):
    from languagedetection_spark.plans.partitioning import (
        stable_order_within_partitions,
    )

    df = spark.read.parquet(os.path.join(fixture_dir, "transcripts.parquet"))
    ordered = stable_order_within_partitions(df, 4)

    def check(batches):
        import pandas as pd

        for pdf in batches:
            keys = list(zip(pdf["conv_id"], pdf["turn_idx"]))
            yield pd.DataFrame({"ok": [keys == sorted(keys)]})

    res = ordered.mapInPandas(check, schema="ok boolean").collect()
    assert all(r["ok"] for r in res)
