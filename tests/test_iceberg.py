"""Iceberg integration: the catalog conf helper is always testable; the
round-trip runs only where the iceberg-spark-runtime jar exists (on the
cluster), so the path is one flag away from live (VERDICT r1 item 8).

NOTE: the round-trip test needs the catalog conf at session-build time; run
it standalone (``pytest tests/test_iceberg.py``) on a jar-equipped host so
the session fixture of the main suite doesn't shadow the conf.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from languagedetection_spark.plans.session import (  # noqa: E402
    get_spark,
    iceberg_available,
    iceberg_conf,
)


def test_iceberg_conf_shape():
    conf = iceberg_conf("lake", "s3://bkt/wh", catalog_type="hive")
    assert conf["spark.sql.catalog.lake"] == (
        "org.apache.iceberg.spark.SparkCatalog"
    )
    assert conf["spark.sql.catalog.lake.type"] == "hive"
    assert conf["spark.sql.catalog.lake.warehouse"] == "s3://bkt/wh"
    assert "IcebergSparkSessionExtensions" in conf["spark.sql.extensions"]


def test_read_transcripts_table_error_is_actionable(spark):
    """Without the jar, a table identifier fails with guidance (not a bare
    AnalysisException)."""
    from languagedetection_spark.sources.readers import read_transcripts

    if iceberg_available():  # pragma: no cover - cluster-only branch
        pytest.skip("iceberg present: covered by test_iceberg_roundtrip")
    with pytest.raises(RuntimeError, match="[Ii]ceberg"):
        read_transcripts(spark, "lake.db.transcripts")


@pytest.mark.skipif(
    not iceberg_available(),
    reason="iceberg-spark-runtime jar not on the classpath",
)
def test_iceberg_roundtrip(tmp_path):  # pragma: no cover - cluster-only
    from pyspark.sql import SparkSession

    from languagedetection_spark.sources.readers import read_transcripts

    if SparkSession.getActiveSession() is not None:
        pytest.skip("needs a fresh session with catalog conf; run this "
                    "file standalone")
    spark = get_spark(
        master="local[2]", app_name="ld-iceberg-test",
        extra_conf=iceberg_conf("local", str(tmp_path / "wh")),
    )
    try:
        spark.sql("CREATE NAMESPACE IF NOT EXISTS local.db")
        spark.sql(
            "CREATE TABLE local.db.transcripts (conv_id string, "
            "turn_idx int, role string, text string, tool string, "
            "ts timestamp) USING iceberg"
        )
        spark.sql(
            "INSERT INTO local.db.transcripts VALUES "
            "('c1', 0, 'user', 'hello world', NULL, TIMESTAMP '2026-01-01')"
        )
        got = read_transcripts(spark, "local.db.transcripts").collect()
        assert len(got) == 1 and got[0]["conv_id"] == "c1"
    finally:
        spark.stop()
