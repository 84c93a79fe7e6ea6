"""Sources: the reference's regex-CSV scan plus production readers.

* ``read_regex_csv``   -- op-1 (Language.scala:309-314): the reference reads
  the WHOLE resource as one string and regex-extracts (text, language) pairs
  with ``(?<text>[\\S\\s]+?),(?<language>\\S+)`` (Demo.scala:10).  Multi-line
  texts are why a plain CSV parse won't do.  Re-expressed distributed:
  ``spark.read.text(wholetext=True)`` per file -> regexp_extract_all both
  groups -> explode -> inner-join the language dim (unknown names drop,
  op-2).  Each file is one row pre-explode, so files parallelize; a single
  giant file does not (exactly like the reference's single resource).
* ``read_transcripts`` -- the input_hint table: Iceberg when a catalog is
  configured, Parquet path otherwise.  The catalog conf is one flag away:
  ``get_spark(extra_conf=plans.session.iceberg_conf(...))`` (the runtime
  jar is absent in this environment; tests/test_iceberg.py gates the
  round-trip on ``iceberg_available()``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# Demo.scala:10 -- named groups become group indices 1 and 2
REFERENCE_CSV_REGEX = r"([\S\s]+?),(\S+)"

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def read_regex_csv(spark: SparkSession, path: str,
                   regex: str = REFERENCE_CSV_REGEX) -> DataFrame:
    """(text, language) rows per the reference's regex scan; unknown
    language names are dropped by the dim join (Language.scala:312-313)."""
    from ..refmodel.alphabets import LANGUAGES

    raw = spark.read.text(path, wholetext=True)
    pairs = raw.select(
        F.explode(
            F.arrays_zip(
                F.regexp_extract_all("value", F.lit(regex), F.lit(1)).alias("text"),
                F.regexp_extract_all("value", F.lit(regex), F.lit(2)).alias("name"),
            )
        ).alias("p")
    ).select(F.col("p.text").alias("text"), F.col("p.name").alias("name"))
    # forName strips + lowercases and knows all 24 names, INCLUDING the two
    # dead-alphabet languages (Language.scala:448-474)
    names = spark.createDataFrame(
        [(l,) for l in LANGUAGES], "language string"
    )
    resolved = pairs.join(
        F.broadcast(names),
        F.lower(F.trim(pairs.name)) == F.col("language"),
    )
    return resolved.select("text", "language")


def read_transcripts(spark: SparkSession, source: str) -> DataFrame:
    """Read the transcripts table from an Iceberg identifier
    (``catalog.db.table``) or a Parquet path."""
    if "/" not in source and "." in source:
        try:
            return spark.read.table(source)
        except Exception as e:  # Iceberg runtime not on classpath here
            raise RuntimeError(
                f"table read failed for {source!r} (Iceberg runtime jar "
                f"required on the cluster classpath): {e}"
            ) from e
    return spark.read.schema(TRANSCRIPT_SCHEMA).parquet(source)
