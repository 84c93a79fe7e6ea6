import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from languagedetection_spark.plans.session import get_spark

    import tempfile

    spark = get_spark(
        master="local[4]",
        app_name="ld-spark-tests",
        shuffle_partitions=4,
        extra_conf={
            "spark.sql.execution.arrow.maxRecordsPerBatch": "500",
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="ld_wh_"),
        },
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    from languagedetection_spark.fixtures import write_parquet_fixtures

    d = tmp_path_factory.mktemp("fixtures")
    write_parquet_fixtures(str(d), n_convs=60, avg_turns=8)
    return str(d)


@pytest.fixture(scope="session")
def oracle_model(fixture_dir):
    """(Vocabulary, TrigramModel, corpus_rows) built from the fixture corpus."""
    import pyarrow.parquet as pq

    from languagedetection_spark.refmodel.classifier import Vocabulary
    from languagedetection_spark.refmodel.quality import TrigramModel

    corpus = pq.read_table(
        os.path.join(fixture_dir, "labeled_corpus.parquet")
    ).to_pylist()
    rows = [(r["language"], r["text"]) for r in corpus]
    v = Vocabulary()
    for lang, text in rows:
        v.load_labeled(lang, text)
    return v, TrigramModel.train(rows), rows
