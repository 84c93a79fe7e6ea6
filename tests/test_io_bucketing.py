"""Source/sink format coverage (csv/json/orc round-trips) and the bucketed
co-located join -- the no-shuffle join technique for repeated large joins
at 100 TB (pyspark guide 'Partitioning & shuffle')."""

import os

from pyspark.sql import functions as F


def test_csv_json_orc_roundtrip(spark, tmp_path):
    df = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    want = sorted(map(tuple, df.collect()))

    csv_dir = str(tmp_path / "csv")
    df.write.mode("overwrite").option("header", True).csv(csv_dir)
    got_csv = spark.read.schema(df.schema).option("header", True).csv(csv_dir)
    assert sorted(map(tuple, got_csv.collect())) == want

    json_dir = str(tmp_path / "json")
    df.write.mode("overwrite").json(json_dir)
    got_json = spark.read.schema(df.schema).json(json_dir)
    assert sorted(map(tuple, got_json.collect())) == want

    orc_dir = str(tmp_path / "orc")
    df.write.mode("overwrite").orc(orc_dir)
    assert sorted(map(tuple, spark.read.orc(orc_dir).collect())) == want


def test_partitioned_write_prunes(spark, tmp_path):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "bylang")
    df.write.mode("overwrite").partitionBy("lang").parquet(out)
    q = spark.read.parquet(out).filter(F.col("lang") == "en")
    plan = q._jdf.queryExecution().executedPlan().toString()
    # partition pruning: the lang filter becomes a PartitionFilter, not a scan
    assert "PartitionFilters: [isnotnull(lang" in plan
    assert q.count() == df.filter("lang = 'en'").count()


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Two tables bucketed on the join key co-locate: the sort-merge join
    needs NO Exchange on either side."""
    # warehouse dir is a static conf -- pointed at a tmp dir in conftest
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        lineitem = spark.read.parquet(
            "/root/testdata/sf0.001/lineitem.parquet"
        )
        (orders.write.mode("overwrite").bucketBy(4, "o_orderkey")
         .sortBy("o_orderkey").saveAsTable("orders_b"))
        (lineitem.write.mode("overwrite").bucketBy(4, "l_orderkey")
         .sortBy("l_orderkey").saveAsTable("lineitem_b"))
        joined = spark.table("lineitem_b").join(
            spark.table("orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle either side
        assert joined.count() == lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey
        ).count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
