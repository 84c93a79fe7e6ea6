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


def es_key(key_col, weight_col, salt: str = "aes-v1"):
    """Efraimidis-Spirakis exponential key: -ln(u)/w, with u derived from
    the same stable md5 family as ``hash_uniform`` but offset to
    (h + 0.5) / 2^60 so u is STRICTLY inside (0, 1) -- ln(0) is an error
    in DuckDB and NULL in Spark, and a 2^-60 digest would silently
    diverge the engines.  Taking the k SMALLEST keys samples k items
    without replacement with probability proportional to ``weight_col``."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(key_col.cast("string"), F.lit(":" + salt))), 1, 15
        ),
        16, 10,
    ).cast("bigint")
    u = (h + F.lit(0.5)) / F.lit(float(1 << HASH_BITS))
    return -F.log(u) / weight_col


def weighted_sample_df(docs: DataFrame, weight_col, k: int,
                       stratum_col: str = "source",
                       key_col: str = "doc_id",
                       salt: str = "aes-v1") -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis A-ES):
    keep the k docs with the smallest -ln(u)/w per stratum.  The standard
    corpus-mixing primitive when docs have unequal importance (quality
    scores, DSIR weights, token counts) and the mixture spec is 'k docs
    per source', not a rate.

    Deterministic and engine-portable for the same reasons as
    ``sample_stratified_df`` (md5, no RNG state), so retries and the
    DuckDB oracle reproduce the exact kept set.  Ranking uses the key
    ROUNDED to 10 dp with a doc_id tie-break, so cross-engine libm ulp
    differences in ln() cannot flip ranks.

    Scale shape: the key is map-only per row; per-stratum top-k is a
    window over the stratum shuffle.  At 100 TB with huge strata, bound
    the sort by pre-pruning with an approximate per-stratum threshold
    (approxQuantile of the key at ~k/stratum_rows) before the window --
    the key column itself makes that a one-pass filter.

    Precondition: ``weight_col`` > 0 (A-ES is undefined otherwise — a zero
    weight divides by zero and a negative weight inverts the key order);
    callers derive weights as count+1 style positives.  NULLS LAST is
    pinned on both window keys (repo hard rule: Spark ASC defaults NULLS
    FIRST, DuckDB NULLS LAST) so a NULL key — e.g. a NULL weight slipping
    through — ranks identically on both engines instead of silently
    winning the sample on one of them."""
    keyed = docs.withColumn(
        "es_key", F.round(es_key(F.col(key_col), weight_col, salt), 10)
    )
    from pyspark.sql import Window
    w = (Window.partitionBy(stratum_col)
         .orderBy(F.asc_nulls_last("es_key"), F.asc_nulls_last(key_col)))
    return (
        keyed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )
