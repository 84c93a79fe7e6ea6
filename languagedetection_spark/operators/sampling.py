"""Deterministic corpus sampling for training-data mixing.

A 100 TB pipeline resamples sources to target mixture weights.  Doing that
with ``rand()`` is irreproducible and engine-specific; the standard
alternative is HASH sampling: a doc is kept iff a stable hash of its key
lands under the stratum's rate.  Properties that matter at scale:

* deterministic & engine-portable -- md5-based, so runs, retries, and the
  DuckDB oracle agree row-for-row (no seed plumbing, no RNG state);
* map-only -- the rate dim broadcasts; nothing shuffles;
* composable -- consistent across engines AND across runs, so incremental
  ingestion keeps/drops the same historical docs.

u(doc) = ('0x' || first 15 hex chars of md5(key || ':' || salt)) / 2^60 is
uniform on [0, 1); keep iff u < rate(stratum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

HASH_BITS = 60  # 15 hex chars: fits BIGINT in Spark and DuckDB alike


def hash_uniform(key_col, salt: str):
    """Uniform-[0,1) column from a stable md5 of ``key:salt`` -- JVM-native
    (conv on the hex digest), no UDF."""
    h = F.md5(F.concat(key_col.cast("string"), F.lit(":" + salt)))
    return (
        F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")
        / F.lit(float(1 << HASH_BITS))
    )


def sample_stratified_df(docs: DataFrame, rates: DataFrame,
                         stratum_col: str = "lang",
                         key_col: str = "doc_id",
                         salt: str = "mix-v1") -> DataFrame:
    """Keep each doc with its stratum's probability, deterministically.

    rates: (``stratum_col``, rate double).  Strata absent from *rates*
    drop entirely (rate 0) -- explicit mixtures only.  The rate table is
    broadcast; the plan is scan -> broadcast-join -> filter, map-only."""
    u = hash_uniform(F.col(key_col), salt).alias("_u")
    return (
        docs.join(F.broadcast(rates), stratum_col)
        .select(docs["*"], u, F.col("rate"))
        .filter(F.col("_u") < F.col("rate"))
        .drop("_u", "rate")
    )
