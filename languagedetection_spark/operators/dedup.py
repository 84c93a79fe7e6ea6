"""Deduplication operators for large-scale training-data pipelines.

Four families, all deterministic and engine-portable (hashes are md5-based so
a DuckDB oracle can reproduce them bit-for-bit):

* exact          -- hash-groupBy on the full text.
* ngram_jaccard  -- exact Jaccard over distinct word-3-gram shingles via a
                    shingle self-join (candidates = pairs sharing >= 1
                    shingle).  At 100 TB, prune ultra-frequent shingles
                    (they generate quadratic candidates) before the join;
                    the operator takes ``max_shingle_freq`` for that.
* minhash_lsh    -- K min-hashes from ONE md5 per shingle (affine family
                    over the digest's lower 64 bits, = DuckDB's
                    md5_number_lower), banded into B bands of R rows; docs
                    sharing a band key are candidates, then verified with
                    exact Jaccard.  Shuffles only candidate pairs, not the
                    cross product.
* simhash        -- 60-bit SimHash computed ROW-LOCALLY inside an Arrow
                    batch (no shingle explode -- the whole signature is one
                    map), banded on 15-bit slices, verified by hamming
                    distance via bit_count(xor).

All take/return DataFrames so they compose with any source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..plans.cache_registry import cache as _cached

MINHASH_K = 12
MINHASH_BANDS = 3
MINHASH_ROWS = 4  # K = BANDS * ROWS
SIMHASH_BITS = 60
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = 15


def shingle_df(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document (split on single spaces).

    Docs with fewer than *n* tokens are filtered BEFORE the position
    sequence: Spark's ``sequence(1, 0)`` DESCENDS (returns [1, 0]), so the
    unguarded form fabricated phantom shingles for short/empty/NULL texts
    (SQL ``generate_series(1, 0)`` is empty -- the engines disagree
    exactly off the fixture domain)."""
    toks = F.split(F.col(text_col), " ")
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    shingles = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n))
    )
    return (
        docs.filter(F.size(toks) >= n)
        .select(F.col(id_col).alias("doc_id"),
                F.explode(shingles).alias("shingle"))
        .distinct()
    )


def dedup_exact_df(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    return docs.groupBy(text_col).agg(
        F.min(id_col).alias("keep_doc_id"),
        F.count("*").alias("n_copies"),
    ).select("keep_doc_id", "n_copies")


def _verify_jaccard(pairs: DataFrame, shingles: DataFrame,
                    threshold: float) -> DataFrame:
    """Exact Jaccard for candidate (doc_a, doc_b) pairs via two shingle
    joins; sizes are broadcast (one row per doc)."""
    sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = shingles.select(F.col("doc_id").alias("doc_a"),
                        F.col("shingle").alias("sh"))
    b = shingles.select(F.col("doc_id").alias("doc_b"),
                        F.col("shingle").alias("sh"))
    inter = (
        pairs.join(a, "doc_a").join(b, ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"),
                      F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"),
                      F.col("n_sh").alias("nb"))
    return (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("na") + F.col("nb") - F.col("n_inter")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


MAX_SHINGLE_FREQ_DEFAULT = 128


def dedup_ngram_jaccard_df(docs: DataFrame, threshold: float = 0.5,
                           max_shingle_freq: int | None =
                           MAX_SHINGLE_FREQ_DEFAULT) -> DataFrame:
    """Exact near-dup pairs by shingle Jaccard.  ``max_shingle_freq`` drops
    shingles shared by more than that many docs from CANDIDATE GENERATION
    only (verification still uses all shingles), the standard guard against
    quadratic blowup on stop-shingles at scale.

    The guard is ON BY DEFAULT (cap 128): a shingle shared by f docs emits
    O(f^2) candidate pairs, so one boilerplate phrase repeated across a
    100 TB corpus would otherwise dominate the join.  Pairs whose ONLY
    shared shingles are ultra-frequent are missed by design (they are
    boilerplate matches, not near-duplicates); pass ``None`` to disable
    for exhaustive small-corpus runs.

    The shingle set is persisted: the plan consumes it from six branches
    (guard frequency, two candidate sides, two verify sides, sizes) whose
    per-branch column pruning defeats exchange reuse — unpersisted, the
    corpus is re-scanned and re-shingled 16x per run (measured; post-AQE
    ReusedExchange count stays 0).  The cache is registered with
    plans.cache_registry (NOT left to the ContextCleaner, which never
    frees DataFrame caches — CacheManager pins the InMemoryRelation until
    an explicit unpersist): the next top-level registry query releases
    it, once this query's consumers have been collected."""
    sh = shingle_df(docs).transform(_cached)
    cand_src = sh
    if max_shingle_freq is not None:
        freq = sh.groupBy("shingle").agg(F.count("*").alias("f"))
        cand_src = sh.join(
            F.broadcast(freq.filter(F.col("f") <= max_shingle_freq)),
            "shingle",
        ).select("doc_id", "shingle")
    a = cand_src.select(F.col("doc_id").alias("doc_a"),
                        F.col("shingle").alias("sh"))
    b = cand_src.select(F.col("doc_id").alias("doc_b"),
                        F.col("shingle").alias("sh"))
    pairs = (
        a.join(b, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return _verify_jaccard(pairs, sh, threshold)


def containment_pairs_df(docs: DataFrame, threshold: float = 0.9,
                         max_shingle_freq: int | None =
                         MAX_SHINGLE_FREQ_DEFAULT) -> DataFrame:
    """Asymmetric set-containment near-dup pairs (Broder 1997): for each
    candidate pair, c(A,B) = |A ∩ B| / |A| and c(B,A) = |A ∩ B| / |B| over
    distinct word-3-gram shingles; a pair qualifies when EITHER direction
    reaches *threshold*.  This is the detector for truncated or quoted
    copies: a 40-token prefix of a 200-token doc has containment 1.0 while
    its symmetric Jaccard is ~0.2 — whole-doc Jaccard dedup misses it by
    design.

    Scale shape is the guarded-Jaccard one: candidates come from the
    stop-shingle-guarded equi-join (never all-pairs), verification is
    candidate-bounded, per-doc sizes broadcast; the shingle set is
    persisted for the same six-branch-reuse reason as
    dedup_ngram_jaccard_df (16 corpus re-scans otherwise)."""
    sh = shingle_df(docs).transform(_cached)
    cand_src = sh
    if max_shingle_freq is not None:
        freq = sh.groupBy("shingle").agg(F.count("*").alias("f"))
        cand_src = sh.join(
            F.broadcast(freq.filter(F.col("f") <= max_shingle_freq)),
            "shingle",
        ).select("doc_id", "shingle")
    a = cand_src.select(F.col("doc_id").alias("doc_a"),
                        F.col("shingle").alias("sh"))
    b = cand_src.select(F.col("doc_id").alias("doc_b"),
                        F.col("shingle").alias("sh"))
    pairs = (
        a.join(b, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    av = sh.select(F.col("doc_id").alias("doc_a"),
                   F.col("shingle").alias("sh"))
    bv = sh.select(F.col("doc_id").alias("doc_b"),
                   F.col("shingle").alias("sh"))
    inter = (
        pairs.join(av, "doc_a").join(bv, ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"),
                      F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"),
                      F.col("n_sh").alias("nb"))
    ca = F.col("n_inter") / F.col("na")
    cb = F.col("n_inter") / F.col("nb")
    return (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .filter(F.greatest(ca, cb) >= threshold)
        .select(
            "doc_a", "doc_b", "n_inter",
            F.round(ca, 4).alias("cont_a"),
            F.round(cb, 4).alias("cont_b"),
        )
    )


# one-md5-per-shingle universal-hash family: base hash m(shingle) is the
# LOWER 64 bits of md5 (little-endian digest bytes 8..15 -- exactly DuckDB's
# md5_number_lower, so the oracle reproduces every value), then k affine
# permutation approximations h_i = (A_i * (m mod P) + B_i) mod P over the
# Mersenne prime P = 2^31 - 1.  A_i/B_i are tiny closed-form constants so
# the SQL twin can regenerate them from i alone.
MINHASH_P = 2147483647  # 2^31 - 1


def _minhash_coeffs(k: int):
    import numpy as np

    i = np.arange(k, dtype=np.uint64)
    a = (np.uint64(1000003) * (i + np.uint64(1))) % np.uint64(MINHASH_P)
    b = (np.uint64(999983) * i + np.uint64(12345)) % np.uint64(MINHASH_P)
    return a, b


def minhash_signatures_df(docs: DataFrame, k: int = MINHASH_K,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Row-local MinHash signatures over Arrow batches — MAP-ONLY.

    ONE md5 per distinct 3-word shingle (the round-1 form paid k=12 md5s
    per shingle -- the measured hot spot of the whole dedup family); the k
    min-hashes come from a vectorized affine family over the digest:
    h_i = (A_i * (md5_lower64 mod P) + B_i) mod P, P = 2^31 - 1.  Every
    value is bit-reproducible in DuckDB via md5_number_lower (oracle:
    DEDUP_MINHASH_SQL).  Docs with no shingles (< 3 tokens) emit an empty
    sig array and must be filtered before banding."""

    def run(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        a, b = _minhash_coeffs(k)
        a2, b2 = a[:, None], b[:, None]
        p = np.uint64(MINHASH_P)
        empty: list = []
        for pdf in batches:
            ids, sigs = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = (text if isinstance(text, str) else "").split(" ")
                if len(toks) >= 3:
                    shingles = {
                        " ".join(toks[i:i + 3]).encode()
                        for i in range(len(toks) - 2)
                    }
                    ms = np.fromiter(
                        (int.from_bytes(
                            hashlib.md5(s).digest()[8:], "little")
                         for s in shingles),
                        dtype=np.uint64, count=len(shingles),
                    )
                    # a,r < 2^31 so a*r + b < 2^62: exact in uint64
                    h = (a2 * (ms % p)[None, :] + b2) % p
                    sig = h.min(axis=1).astype(np.int64).tolist()
                else:
                    sig = empty
                ids.append(doc_id)
                sigs.append(sig)
            yield pd.DataFrame({"doc_id": ids, "sig": sigs})

    return docs.mapInPandas(run, "doc_id long, sig array<long>")


def minhash_signatures_native_df(docs: DataFrame, k: int = MINHASH_K,
                                 id_col: str = "doc_id",
                                 text_col: str = "text") -> DataFrame:
    """JVM-native MinHash signatures: the production twin of
    minhash_signatures_df with ``xxhash64`` as the base hash.

    The whole signature is ONE whole-stage-codegen expression -- no Python
    workers, no Arrow transfer, no shuffle.  The k minimums are folded in a
    SINGLE pass over the hashed-shingle array:

        shingles = transform(sequence(...), i -> concat_ws(slice(toks,i,3)))
        ms       = transform(shingles, s -> pmod(xxhash64(s), P))
        sig      = aggregate(ms, [P]*k,
                             (acc, m) -> transform(1..k,
                                 i -> least(acc[i], (A[i]*m + B[i]) % P)))

    The fold matters: the naive form -- k separate
    array_min(transform(ms, ...)) columns -- makes Catalyst re-evaluate the
    whole tokenize+shingle+hash chain once PER signature element (no CSE
    across sibling Project expressions): measured 20.7 s vs 2.0 s for this
    form at sf0.1.

    Honest measurement (sf0.1, warm JVM + warm Python workers, single
    partition): this fold runs 2.0 s; an explode + codegen'd 12-min
    hash-aggregate twin also 2.1 s (but +1 shuffle); the Arrow+numpy md5
    kernel (minhash_signatures_df) 0.8 s.  Spark's higher-order functions
    are interpreted per element (no whole-stage codegen), so the
    one-C-md5-per-distinct-shingle + vectorized-numpy-affine kernel is
    ~2.5x FASTER per core than any JVM expression formulation we found --
    the r2 hypothesis that the Python md5 dominates is false post the
    one-md5-per-shingle rewrite.  This variant therefore exists for
    deployments that must run without Python workers (pure-JVM executors,
    constrained executor memory), not as a speedup; it is map-only,
    shuffle-free, and differential-tested against the md5 contract form
    (tests/test_dedup_hash_family.py).  Same affine family/constants as
    the md5 path (A_i, B_i < P = 2^31-1, so A_i*m + B_i < 2^62 stays exact
    in signed 64-bit arithmetic)."""
    a, b = _minhash_coeffs(k)
    toks = F.split(F.col(text_col), " ")
    idx = F.sequence(F.lit(1), F.size(toks) - 2)
    shingles = F.array_distinct(F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i, 3))
    ))
    p = F.lit(MINHASH_P).cast("long")
    ms = F.transform(shingles, lambda s: F.pmod(F.xxhash64(s), p))
    a_arr = F.array(*[F.lit(int(x)).cast("long") for x in a])
    b_arr = F.array(*[F.lit(int(x)).cast("long") for x in b])
    init = F.array_repeat(p, k)
    ks = F.sequence(F.lit(1), F.lit(k))  # element_at is 1-based
    sig = F.aggregate(
        ms, init,
        lambda acc, m: F.transform(ks, lambda i: F.least(
            F.element_at(acc, i),
            (F.element_at(a_arr, i) * m + F.element_at(b_arr, i)) % p)),
    )
    return (
        docs.filter(F.size(toks) >= 3)
        .select(F.col(id_col).alias("doc_id"), sig.alias("sig"))
    )


MAX_BAND_FREQ_DEFAULT = 256


def _band_freq_guard(banded: DataFrame, keys: list[str],
                     cap: int | None) -> DataFrame:
    """Drop LSH bucket keys shared by more than *cap* docs from candidate
    generation (the band-join twin of the stop-shingle guard): a crowd of
    f exact-duplicate texts shares EVERY band key and emits O(f^2)
    candidate pairs per band -- measured: a 775k-turn corpus with
    generator-duplicated texts made the unguarded band join run for
    minutes at local[8].  Exact-duplicate crowds belong to exact dedup
    (run dedup_exact / --dedup exact first); the guard makes near-dup
    LSH robust to them at any scale.  Over-full buckets are either such
    crowds or degenerate signatures, so the (bounded) recall loss is by
    design; pass ``cap=None`` for exhaustive small-corpus runs."""
    if cap is None:
        return banded
    freq = banded.groupBy(*keys).agg(F.count("*").alias("__f"))
    return banded.join(
        freq.filter(F.col("__f") <= cap).select(*keys), keys
    )


def dedup_minhash_lsh_df(docs: DataFrame, threshold: float = 0.5,
                         k: int = MINHASH_K, bands: int = MINHASH_BANDS,
                         rows: int = MINHASH_ROWS,
                         hash_family: str = "md5",
                         max_band_freq: int | None =
                         MAX_BAND_FREQ_DEFAULT) -> DataFrame:
    """MinHash + banded LSH candidates, exact-Jaccard verified.

    h_i(doc) = min over shingles of an affine family over the shingle's
    lower-64-bit md5 (see minhash_signatures_df) -- portable to any engine
    with md5, so the whole pipeline is DuckDB-oracle-checkable.  Signatures
    are computed map-only; band key = '_'-joined decimal min-hashes of the
    band's R rows; only same-band pairs are shuffled.

    ``hash_family="xxhash64"`` swaps in the JVM-native signature kernel
    (minhash_signatures_native_df) for production runs: identical banding,
    verification, and output contract; different (but equally uniform) LSH
    randomness, so candidate sets may differ while verified pairs at the
    Jaccard threshold agree (pinned by the differential test).

    The shingle set is persisted for the verify stage: _verify_jaccard
    consumes it from three pruned branches (sizes + both intersection
    sides), the same multi-consumer shape that cost the Jaccard operator
    16 corpus re-scans before its persist fix."""
    sh = shingle_df(docs).transform(_cached)
    spark = docs.sparkSession
    if hash_family == "xxhash64":
        sig = minhash_signatures_native_df(docs, k)
    elif hash_family == "md5":
        sig = minhash_signatures_df(docs, k).filter(F.size("sig") > 0)
    else:
        raise ValueError(f"unknown hash_family: {hash_family!r}")
    band_ids = spark.range(bands).select(F.col("id").cast("int").alias("b"))
    # persisted: the band-frequency guard and both self-join sides are
    # three separately-pruned consumers of the banded signatures -- the
    # cache makes the k-hash signature kernel run exactly once instead of
    # relying on ReuseExchange (which the guard branch defeats)
    banded = sig.crossJoin(F.broadcast(band_ids)).select(
        "doc_id", "b",
        F.expr(f"concat_ws('_', slice(sig, b * {rows} + 1, {rows}))")
        .alias("key"),
    ).transform(_cached)
    if hash_family == "xxhash64":
        # expression-backed sig would be recomputed once per self-join side;
        # an explicit band-key shuffle is built once and reused by both
        # sides (ReuseExchange) -- measured 4.7 s -> 3.5 s at sf0.1.  The
        # md5 path already reuses its exchange, so it keeps the plain plan.
        banded = banded.repartition("b", "key")
    banded = _band_freq_guard(banded, ["b", "key"], max_band_freq)
    left = banded.select("b", "key", F.col("doc_id").alias("doc_a"))
    right = banded.select("b", "key", F.col("doc_id").alias("doc_b"))
    pairs = (
        left.join(right, ["b", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return _verify_jaccard(pairs, sh, threshold)


def simhash_df(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """60-bit SimHash per doc, computed row-locally in an Arrow batch.

    bit_p(doc) = 1 iff sum over distinct shingles of (2*bit_p(h)-1) > 0,
    h = int(md5(shingle)[:15], 16).  Map-only: nothing shuffles."""

    def run(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        shifts = np.arange(SIMHASH_BITS, dtype=np.uint64)
        weights = (np.uint64(1) << shifts).astype(np.int64)
        for pdf in batches:
            ids, fps = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = [t for t in (text or "").split(" ") if t]
                shingles = {
                    " ".join(toks[i:i + 3]) for i in range(len(toks) - 2)
                }
                if not shingles:
                    # no signature: emitting fp=0 would cluster every
                    # shingle-less doc into one fake hamming-0 'near-dup'
                    # group (and diverge from the relational oracle, where
                    # such docs simply have no rows)
                    continue
                ids.append(doc_id)
                # one md5 per shingle, then ONE vectorized (n, 60) bit
                # matrix: sum(2b-1) = 2*sum(b) - n per bit position
                hs = np.fromiter(
                    (int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
                     for s in shingles),
                    dtype=np.uint64, count=len(shingles),
                )
                ones = ((hs[:, None] >> shifts[None, :])
                        & np.uint64(1)).sum(axis=0).astype(np.int64)
                acc = 2 * ones - np.int64(len(shingles))
                fp = int(((acc > 0) * weights).sum())
                fps.append(fp)
            yield pd.DataFrame({"doc_id": ids, "fp": fps})

    return docs.mapInPandas(run, schema="doc_id long, fp long")


def contamination_overlap_df(docs: DataFrame, benchmark: DataFrame,
                             min_overlap: int = 2,
                             max_shingle_freq: int | None =
                             MAX_SHINGLE_FREQ_DEFAULT) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing >= *min_overlap*
    distinct word-3-gram shingles with ANY benchmark doc (the standard
    n-gram-overlap contamination test used before training on scraped
    corpora -- evaluation data must not leak into the training set).

    Scale shape: benchmark shingles are DISTINCT and usually tiny relative
    to the corpus -> the join is a broadcast semi-ish equi-join on the
    shingle; ``max_shingle_freq`` prunes stop-shingles from the CORPUS side
    (same guard as dedup_ngram_jaccard_df) so boilerplate doesn't fan out.
    Returns (doc_id, n_overlap) for contaminated docs; anti-join this
    against the corpus to decontaminate."""
    sh = shingle_df(docs)
    if max_shingle_freq is not None:
        freq = sh.groupBy("shingle").agg(F.count("*").alias("f"))
        sh = sh.join(
            F.broadcast(freq.filter(F.col("f") <= max_shingle_freq)),
            "shingle",
        ).select("doc_id", "shingle")
    bench_sh = (
        shingle_df(benchmark).select("shingle").distinct()
    )
    return (
        sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
    )


def _bloom_pos(shingle_col, i: int, m_bits: int):
    """Bit position i for a shingle: md5 of 'i:shingle' -> first 8 hex
    chars -> integer mod m_bits.  The exact engine-portable bucket recipe
    the hashed-ngram langid and DSIR features use, so DuckDB reproduces
    every position ('0x' || substr(md5(..), 1, 8))::BIGINT % m."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{i}:"), shingle_col)), 1, 8),
            16, 10,
        ).cast("long") % m_bits
    )


def bloom_decontaminate_df(docs: DataFrame, benchmark: DataFrame,
                           min_overlap: int = 2, m_bits: int = 4096,
                           k_hashes: int = 3) -> DataFrame:
    """Bloom-filter decontamination: the CONSTANT-SIZE alternative to
    broadcasting every benchmark shingle (contamination_overlap_df).  The
    benchmark's 3-gram shingles are folded into an m_bits-bit Bloom filter
    (k_hashes md5-derived positions each); a corpus shingle counts as
    contaminated iff ALL k of its bits are set.  Supersets the exact
    n-gram overlap by construction (a Bloom filter has NO false
    negatives); false positives are the documented price, rate ~
    (1 - e^(-k*S/m))^k for S benchmark shingles.

    Scale shape: the filter is a driver-built m_bits-char literal mask
    (model-sized REGARDLESS of corpus or benchmark size -- a 4 KB
    constant vs a possibly-GB shingle broadcast) and the corpus side is
    a pure MAP: shingle -> k substring probes into the compiled-literal
    mask, no join at all on the hot path; per-doc aggregation is a
    map-side-combined groupBy on doc_id.  No stop-shingle guard is
    needed because nothing fans out -- each corpus shingle does O(k)
    work whatever its frequency.  Returns (doc_id, n_shingles, n_hit)
    for docs with n_hit >= min_overlap."""
    bench_sh = shingle_df(benchmark).select("shingle").distinct()
    pos_rows = bench_sh.select(
        F.explode(F.array(*[
            _bloom_pos(F.col("shingle"), i, m_bits)
            for i in range(k_hashes)
        ])).alias("pos")
    ).distinct().collect()          # <= m_bits rows: model-sized collect
    mask = ["0"] * m_bits
    for r in pos_rows:
        mask[int(r["pos"])] = "1"
    mask_lit = F.lit("".join(mask))
    sh = shingle_df(docs)
    hit = F.lit(True)
    for i in range(k_hashes):
        hit = hit & (
            F.substring(mask_lit, (_bloom_pos(F.col("shingle"), i, m_bits)
                                   + 1).cast("int"), 1) == "1"
        )
    return (
        sh.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(hit.cast("long")).alias("n_hit"),
        )
        .filter(F.col("n_hit") >= min_overlap)
    )


def dedup_components_df(nodes: DataFrame, pairs: DataFrame,
                        id_col: str = "doc_id",
                        max_iter: int = 25) -> DataFrame:
    """Connected components over near-dup pairs -> duplicate CLUSTERS.

    The missing last step of every dedup family: pair lists don't dedupe a
    corpus -- you need the transitive closure (a~b, b~c => one cluster) and
    one canonical keeper per cluster.  Algorithm: iterative min-label
    propagation (the standard distributed CC formulation: each round,
    every node takes the min label among itself and its neighbors; a
    hash-join + groupBy-min per round, O(log D) rounds for diameter D).
    Near-dup clusters are small and shallow, so 2-4 rounds in practice;
    rounds stop early via a changed-label count.  Lineage is cut with
    localCheckpoint per round (iterative-Spark standard).  At 100 TB the
    per-round shuffle is on the PAIR list (already candidate-pruned by
    LSH), not the corpus -- the scale-correct shape.

    Singletons never change labels, so the iteration runs ONLY over nodes
    that appear in a pair (the LSH-pruned candidate set -- a tiny fraction
    of a real corpus); untouched docs are unioned back as size-1 clusters
    at the end with no per-round cost.  Per-round work is therefore
    bounded by the pair list, never the corpus.

    nodes: one row per doc (singletons become their own cluster);
    pairs: (doc_a, doc_b) undirected near-dup edges.
    Returns (doc_id, canonical_id, cluster_size); keep = doc_id ==
    canonical_id."""
    all_nodes = nodes.select(F.col(id_col).alias("doc_id"))
    half = pairs.select(F.col("doc_a").alias("src"),
                        F.col("doc_b").alias("dst"))
    sym = half.unionAll(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # drop edges referencing unknown docs -- otherwise phantom ids would
    # enter the label table through propagation and leak into the output
    edges = (
        sym.join(all_nodes.withColumnRenamed("doc_id", "src"), "src",
                 "left_semi")
        .join(all_nodes.withColumnRenamed("doc_id", "dst"), "dst",
              "left_semi")
        .localCheckpoint(eager=True)
    )
    touched = edges.select(F.col("src").alias("doc_id")).distinct()
    labels = (
        all_nodes.join(touched, "doc_id")
        .select("doc_id", F.col("doc_id").alias("label"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr = (
            edges.join(labels, edges.src == labels.doc_id)
            .select(F.col("dst").alias("doc_id"), "label")
        )
        cand = (
            labels.unionAll(nbr)
            .groupBy("doc_id")
            .agg(F.min("label").alias("new_label"))
        )
        changed = (
            labels.join(cand, "doc_id")
            .filter(F.col("label") != F.col("new_label"))
            .count()
        )
        labels = cand.select(
            "doc_id", F.col("new_label").alias("label")
        ).localCheckpoint(eager=True)
        if changed == 0:
            break
    w = W.partitionBy("label")
    clustered = labels.select(
        "doc_id",
        F.col("label").alias("canonical_id"),
        F.count("*").over(w).alias("cluster_size"),
    )
    singletons = all_nodes.join(touched, "doc_id", "left_anti").select(
        "doc_id",
        F.col("doc_id").alias("canonical_id"),
        F.lit(1).cast("long").alias("cluster_size"),
    )
    return clustered.unionAll(singletons)


def dedup_simhash_df(docs: DataFrame, max_hamming: int = 3,
                     max_band_freq: int | None =
                     MAX_BAND_FREQ_DEFAULT) -> DataFrame:
    """SimHash near-dup pairs: band on 15-bit slices (a pair within hamming
    distance 3 of a 60-bit code must agree on >= 1 of 4 bands), verify with
    bit_count(xor).  Band buckets fuller than ``max_band_freq`` are dropped
    from candidate generation (see _band_freq_guard -- exact-dup crowds
    share every band and go quadratic otherwise).

    The signature DataFrame is persisted: the banded view feeds three
    pruned branches (guard frequency + both self-join sides), and without
    the cache each branch re-runs the Arrow signature kernel over the
    whole corpus (the shingle-family exchange-reuse lesson; signatures
    are one small row per doc, the cheapest thing in the plan to hold)."""
    fps = simhash_df(docs).transform(_cached)
    spark = docs.sparkSession
    band_ids = spark.range(SIMHASH_BANDS).select(
        F.col("id").cast("int").alias("b")
    )
    banded = fps.crossJoin(F.broadcast(band_ids)).select(
        "doc_id", "fp", "b",
        F.expr(f"shiftright(fp, b * {SIMHASH_BAND_BITS}) & 32767").alias("key"),
    )
    banded = _band_freq_guard(banded, ["b", "key"], max_band_freq)
    left = banded.select("b", "key", F.col("doc_id").alias("doc_a"),
                         F.col("fp").alias("fp_a"))
    right = banded.select("b", "key", F.col("doc_id").alias("doc_b"),
                          F.col("fp").alias("fp_b"))
    return (
        left.join(right, ["b", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b",
                F.expr("bit_count(fp_a ^ fp_b)").cast("int").alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer, Wilkerson, Aiken 2003): substring-level
# near-dup detection -- the standard guarantee is that any shared substring
# of length >= K + W - 1 chars leaves at least one shared fingerprint, while
# storing only ~2/(W+1) of the k-gram hashes.
# ---------------------------------------------------------------------------

WINNOW_K = 8          # char k-gram length
WINNOW_W = 4          # winnow window (guarantee threshold = K + W - 1 = 11)
WINNOW_P = (1 << 61) - 1  # int64-safe range for the md5-lower-64 base hash
WINNOW_CAP = 32       # stop-fingerprint guard: drop fps in > CAP docs
WINNOW_MIN_SHARED = 15


def winnow_fingerprints_df(docs: DataFrame, k: int = WINNOW_K,
                           w: int = WINNOW_W, id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """Distinct winnowed fingerprint VALUES per doc, map-only over Arrow
    batches: m_i = md5_lower64(text[i:i+k]) % P per char k-gram, then the
    minimum of each w-length window of m, deduplicated.  Keeping only the
    VALUE set (not positions) makes the classic rightmost-tie-break
    irrelevant -- ties collapse in the set -- so the DuckDB twin is a
    plain windowed MIN over the identical md5_number_lower hashes.  Docs
    shorter than k + w - 1 chars emit nothing (no full window)."""

    def run(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        p = np.uint64(WINNOW_P)
        for pdf in batches:
            ids, fps = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                t = text if isinstance(text, str) else ""
                n = len(t)
                if n < k + w - 1:
                    continue
                ms = np.fromiter(
                    (int.from_bytes(
                        hashlib.md5(t[i:i + k].encode()).digest()[8:],
                        "little")
                     for i in range(n - k + 1)),
                    dtype=np.uint64, count=n - k + 1,
                ) % p
                wins = np.lib.stride_tricks.sliding_window_view(ms, w)
                for fp in np.unique(wins.min(axis=1)).astype(np.int64):
                    ids.append(doc_id)
                    fps.append(int(fp))
            yield pd.DataFrame({"doc_id": ids, "fp": fps})

    return docs.mapInPandas(run, "doc_id long, fp long")


def substring_dup_pairs_df(docs: DataFrame, k: int = WINNOW_K,
                           w: int = WINNOW_W,
                           min_shared: int = WINNOW_MIN_SHARED,
                           cap: int = WINNOW_CAP) -> DataFrame:
    """Doc pairs sharing >= min_shared winnowed fingerprints -- substring-
    level near-dup candidates (catches copied PASSAGES that whole-doc
    MinHash dilutes away).

    Scale shape: fingerprints are map-only; the stop-fingerprint guard
    (df <= cap, same design as the n-gram stop-shingle guard) bounds the
    equi-join fanout per fp at cap^2 pairs, so a boilerplate substring
    shared by half the corpus cannot quadratically explode the join; all
    shuffles are fp-keyed with map-side combine on the pair counts.

    Fingerprints are persisted: the guard frequency and both equi-join
    sides are separately-pruned consumers, and without the cache each
    re-runs the winnowing Arrow kernel over the whole corpus."""
    fps = winnow_fingerprints_df(docs, k, w).transform(_cached)
    keep = fps.groupBy("fp").agg(F.count("*").alias("df_")).filter(
        F.col("df_") <= cap
    ).select("fp")
    guarded = fps.join(keep, "fp")
    left = guarded.select("fp", F.col("doc_id").alias("doc_a"))
    right = guarded.select("fp", F.col("doc_id").alias("doc_b"))
    return (
        left.join(right, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def dedup_exact_keep_first(df: DataFrame,
                           key_cols: tuple[str, str] = ("conv_id",
                                                        "turn_idx"),
                           text_col: str = "text") -> DataFrame:
    """Corpus-wide exact dedup keeping ONE deterministic row per distinct
    text: the (conv_id, turn_idx)-minimal turn.  Built for the filter_job
    --dedup stage.

    Scale shape: the keeper per text hash is a skew-immune
    min-of-struct aggregate (partially aggregable map-side, unlike a
    row_number window that funnels a hot text -- think empty strings --
    through one reducer); the re-join is hash-keyed on the text md5."""
    k = F.md5(F.coalesce(F.col(text_col), F.lit("\x00null")))
    a, b = key_cols
    keepers = (
        df.select(k.alias("__k"), F.struct(a, b).alias("__kt"))
        .groupBy("__k").agg(F.min("__kt").alias("__keep"))
        .select("__k", F.col(f"__keep.{a}").alias("__ka"),
                F.col(f"__keep.{b}").alias("__kb"))
    )
    left = df.withColumn("__k", k)
    return (
        left.join(
            keepers,
            (left["__k"] == keepers["__k"])
            & (left[a] == keepers["__ka"])
            & (left[b] == keepers["__kb"]),
        )
        .drop(keepers["__k"]).drop("__k", "__ka", "__kb")
    )


def dedup_minhash_keep_first(df: DataFrame,
                             key_cols: tuple[str, str] = ("conv_id",
                                                          "turn_idx"),
                             text_col: str = "text",
                             threshold: float = 0.8,
                             hash_family: str = "md5") -> DataFrame:
    """Corpus-wide NEAR-dedup keeping one deterministic row per duplicate
    CLUSTER: MinHash-LSH candidates -> exact-Jaccard verify -> connected
    components -> the (conv_id, turn_idx)-minimal turn per cluster.  Built
    for the filter_job ``--dedup minhash`` stage; a strict superset of the
    exact stage (identical texts share every shingle, so they always land
    in one cluster).

    Scale shape: the pair pipeline is the guarded LSH operator (band
    equi-join + frequency cap -- never all-pairs); components iterate over
    the PAIR list only; and the dedup universe is DISTINCT texts keyed by
    the lower 60 bits of their md5 (the signature kernel's Arrow schema
    requires an int64 doc id), so turn multiplicity never inflates the
    LSH input.  A 60-bit collision merges two unrelated texts into one
    cluster and drops one of them -- odds ~N^2/2^61, i.e. ~4e5 wrongly
    dropped turns per 1e12 DISTINCT texts (error rate 4e-7, far below the
    LSH's own false-positive band) -- documented, not defended.  The
    final keeper election is one min-of-struct aggregate per cluster --
    partially aggregable, skew-immune (a viral text's million copies
    combine map-side).

    ``hash_family="xxhash64"`` swaps in the JVM-native signature kernel
    for Python-worker-free deployments (same contract, different LSH
    randomness -- see dedup_minhash_lsh_df)."""
    a, b = key_cols
    k = F.conv(
        F.substring(
            F.md5(F.coalesce(F.col(text_col), F.lit("\x00null"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    # the distinct-text universe: consumed by signatures, shingle verify,
    # and the component node list
    texts = (
        df.select(k.alias("doc_id"), F.col(text_col).alias("text"))
        .distinct()
        .transform(_cached)
    )
    pairs = dedup_minhash_lsh_df(texts, threshold=threshold,
                                 hash_family=hash_family)
    comp = dedup_components_df(texts.select("doc_id"), pairs)
    turns = df.withColumn("__k", k)
    clustered = turns.join(
        comp.select(F.col("doc_id").alias("__k"), "canonical_id"), "__k"
    )
    keepers = (
        clustered.select("canonical_id", F.struct(a, b).alias("__kt"))
        .groupBy("canonical_id")
        .agg(F.min("__kt").alias("__keep"))
        .select(F.col("canonical_id").alias("__kc"),
                F.col(f"__keep.{a}").alias("__ka"),
                F.col(f"__keep.{b}").alias("__kb"))
    )
    return (
        clustered.join(
            keepers,
            (clustered["canonical_id"] == keepers["__kc"])
            & (clustered[a] == keepers["__ka"])
            & (clustered[b] == keepers["__kb"]),
        )
        .drop("__k", "canonical_id", "__kc", "__ka", "__kb")
    )
