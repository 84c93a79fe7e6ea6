"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

The flagship metric is quality-filter throughput (turns/sec) over a
deterministic synthetic transcripts table (seed=42, ~TRANSCRIPT_TURNS turns,
generated once and cached under .bench/); the per-query seconds cover the
registry's representative operators.

Every timed run executes the full plan via the noop DataSource (no driver
collect), matching how a cluster job would sink.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "q1_pricing_summary",
    "revenue_by_nation",
    "order_argmax_per_customer",
    "supplier_running_total",
    "events_sessionize",
    "classify_relational",
    "classify_vectorized",
    "pipeline_keep",
    "doc_token_stats",
    "pipeline_scrub",
    "embedding_topk",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sample_stratified",
    "decontaminate",
    "ann_ivf_topk",
    "ann_sq_topk",
    # new in r3 (excluded from the frozen r2 like-for-like total)
    "tfidf_top_terms",
    "doc_char_entropy",
    "inverted_index",
    "normalize_text",
    "collocations_lift",
    "session_window_events",
    "substring_dup_pairs",
    "word_freq_spectrum",
    "label_centroids",
    "sequence_packing",
    "mixture_rates",
    "doc_repetition",
    "lm_perplexity",
    "dedup_keep_best",
    "importance_weights",
    "embedding_kmeans",
    "semdedup_pairs",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "bloom_decontaminate",
    "bpe_merges",
    "containment_pairs",
    "segment_dedup",
    "doc_chunks",
    "ann_pq_rerank",
    "nb_quality_score",
    "lm_bigram_ppl",
    "sample_weighted",
    "bm25_topk",
    "heavy_hitters",
    "code_switch_segments",
    "source_pagerank",
    # new in r4 (outside both frozen like-for-like cohorts)
    "tokenizer_fertility",
    "padding_waste",
    "doc_novelty",
    "ppl_buckets",
    "dedup_cluster_stats",
    "ann_hard_negatives",
    "token_budget_select",
    "user_retention_cohorts",
    "funnel_conversion",
    "vocab_drift_psi",
    "ngram_coverage_curve",
    "dedup_edit_distance",
    "revenue_range_window",
    "grouping_sets_revenue",
    "label_knn_agreement",
    "lsh_band_sweep",
    # new in r5 (outside all frozen like-for-like cohorts)
    "conv_export",
]  # streaming_* excluded: streaming-query startup dominates

# r2 regression triage (VERDICT r2 "what's wrong" #1): classify_* moved
# 3.60->4.89 s / 1.37->1.93 s without a code cause.  These queries rebuild
# their axiom model per invocation, so bench now (a) times the distributed
# model build separately ("classify_model_build") and (b) runs the classify
# pair best-of-3, interleaved, reporting the min (all runs kept in "runs").
BEST_OF_3 = ["classify_relational", "classify_vectorized"]

# the r2 headline set (17 queries + quality_pipeline_cold/steady): frozen so
# round-over-round totals stay like-for-like (VERDICT r2 ask #8); any query
# added later is reported in the raw total but excluded from this one.
R2_HEADLINE_SET = BENCH_QUERIES[:17] + [
    "quality_pipeline_cold", "quality_pipeline",
]
assert R2_HEADLINE_SET[16] == "ann_sq_topk"  # the frozen r2 boundary

# the r3 cohort (the 49 r2+r3 queries, plus the two pipeline runs = 51
# names) frozen the same way, so r4+ totals stay comparable to BOTH prior
# rounds (VERDICT r3 ask #8)
R3_HEADLINE_SET = BENCH_QUERIES[:49] + [
    "quality_pipeline_cold", "quality_pipeline",
]
assert R3_HEADLINE_SET[48] == "source_pagerank"  # the frozen r3 boundary

# the r4 cohort (all 65 queries benched in r4 + the two pipeline runs)
# frozen for r5+ comparability (VERDICT r4 ask #5)
R4_HEADLINE_SET = BENCH_QUERIES[:65] + [
    "quality_pipeline_cold", "quality_pipeline",
]
assert R4_HEADLINE_SET[64] == "lsh_band_sweep"  # the frozen r4 boundary


def _cohort_total(timings: dict[str, float], cohort: list[str],
                  label: str) -> float:
    """Sum a frozen cohort, failing LOUDLY if any member is missing from
    the timings (ADVICE r4: a renamed/removed query must not silently
    shrink a like-for-like total)."""
    missing = [n for n in cohort if n not in timings]
    assert not missing, f"frozen cohort {label} missing queries: {missing}"
    return round(sum(timings[n] for n in cohort), 3)

TRANSCRIPT_CONVS = int(os.environ.get("BENCH_CONVS", "50000"))
TRANSCRIPT_TURNS_AVG = 16  # ~775k turns + skewed head; big enough that the
# flagship's 32-core wall time (~5 s) dominates fixed overhead -- a 155k-turn
# input finished in ~1.5 s and produced co-tenancy-noisy turns/sec numbers


def _ensure_transcripts(path: str) -> str:
    if not os.path.exists(path):
        from languagedetection_spark.fixtures.generate import (
            gen_transcripts,
        )
        import pyarrow as pa
        import pyarrow.parquet as pq

        rows = gen_transcripts(
            seed=42, n_convs=TRANSCRIPT_CONVS, avg_turns=TRANSCRIPT_TURNS_AVG
        )
        os.makedirs(os.path.dirname(path), exist_ok=True)
        t = pa.table({
            "conv_id": pa.array([r["conv_id"] for r in rows], pa.string()),
            "turn_idx": pa.array([r["turn_idx"] for r in rows], pa.int32()),
            "role": pa.array([r["role"] for r in rows], pa.string()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "tool": pa.array([r["tool"] for r in rows], pa.string()),
            "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us", tz="UTC")),
        })
        # small row groups -> many scan splits, like a real multi-file
        # dataset; a single fat row group caps scan parallelism at 1-3 tasks
        pq.write_table(t, path, row_group_size=4096)
    return path


def _run_noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    from pyspark.sql.functions import broadcast as F_broadcast

    from languagedetection_spark.entry_queries import QUERIES
    from languagedetection_spark.fixtures.generate import gen_labeled_corpus
    from languagedetection_spark.functions.kernels import FilterModel
    from languagedetection_spark.functions.udfs import broadcast_model
    from languagedetection_spark.operators.quality_filter import quality_filter
    from languagedetection_spark.plans.session import get_spark

    spark = get_spark(
        master=f"local[{cpus}]", shuffle_partitions=cpus,
        app_name="ld-spark-bench",
        extra_conf={
            # local sf files are a few MB; split them like a real dataset
            # (at 100 TB the defaults -- 128 MB splits -- are correct)
            "spark.sql.files.maxPartitionBytes": str(1 << 20),
            "spark.sql.files.openCostInBytes": str(1 << 18),
        },
    )

    repo = os.path.dirname(os.path.abspath(__file__))
    transcripts_path = _ensure_transcripts(
        os.path.join(repo, ".bench", f"transcripts_{TRANSCRIPT_CONVS}.parquet")
    )

    # warm-up: JVM codegen plus one pandas-UDF stage so every Python worker
    # is spawned before timing starts (steady-state throughput is the metric)
    spark.range(1000).selectExpr("sum(id)").collect()
    import pandas as pd  # noqa: F401

    def _noop_udf(it):
        for pdf in it:
            yield pdf

    (spark.range(cpus * 4).repartition(cpus * 2)
     .mapInPandas(_noop_udf, schema="id long")
     .write.format("noop").mode("overwrite").save())

    def _loadavg() -> list[float]:
        with open("/proc/loadavg") as f:
            return [float(x) for x in f.read().split()[:3]]

    load_start = _loadavg()

    # TWO interleaved passes over the whole set, min per query (VERDICT r2
    # ask #8: interleave runs so a co-tenant load spike on one pass cannot
    # masquerade as a query regression; r3 observed 14.2 s vs 2.7 s warm
    # for the same query under a spike).  All raw passes are published.
    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    for _pass in range(2):
        for name in BENCH_QUERIES:
            fn = QUERIES[name]
            t0 = time.time()
            _run_noop(fn(spark, sf_dir))
            runs.setdefault(name, []).append(round(time.time() - t0, 3))
    for name in BENCH_QUERIES:
        timings[name] = min(runs[name])

    # classify_* rebuild their axiom model per invocation; time the
    # distributed build alone so model-build vs scoring cost is attributable
    # (the build is the same axiom_rows_df().collect() classify_vectorized
    # runs internally).
    from languagedetection_spark.operators.training import axiom_rows_df
    from languagedetection_spark.entry_queries import _dim_df

    d0 = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    dim = _dim_df(spark)
    labeled = (
        d0.filter("source = 'src0'")
        .join(F_broadcast(dim), d0.lang == dim.iso)
        .select("language", "text")
    )
    t0 = time.time()
    n_axioms = len(axiom_rows_df(labeled).collect())
    timings["classify_model_build"] = round(time.time() - t0, 3)

    # classify pair: ONE extra pass on top of the two global passes keeps
    # them best-of-3 (the r2 regression-attribution protocol)
    for name in BEST_OF_3:
        t0 = time.time()
        _run_noop(QUERIES[name](spark, sf_dir))
        runs[name].append(round(time.time() - t0, 3))
        timings[name] = min(runs[name])

    # flagship: quality-filter throughput over the synthetic transcripts
    corpus = [(lang, text) for text, lang, _iso in gen_labeled_corpus()]
    model = FilterModel.from_corpus(corpus)
    bc = broadcast_model(spark, model)
    tdf = spark.read.parquet(transcripts_path)
    n_turns = tdf.count()
    # Map-only: scan splits (1 MiB, set above) flow straight into the Arrow
    # kernel with no exchange -- the production plan.  Per-turn scoring is
    # row-local, so conv_id skew cannot unbalance it; the salted repartition
    # is reserved for conv-level aggregates (see BENCH/BASELINE.md for the
    # measured shuffle tax of salting this hot path: 8->32-core efficiency
    # 0.87 map-only vs 0.63 salted).
    t0 = time.time()
    _run_noop(quality_filter(tdf, bc))
    timings["quality_pipeline_cold"] = round(time.time() - t0, 3)
    # steady-state (warm JIT + page cache) is the cluster-relevant number
    t0 = time.time()
    _run_noop(quality_filter(tdf, bc))
    pipeline_sec = time.time() - t0
    timings["quality_pipeline"] = round(pipeline_sec, 3)

    total = round(sum(timings.values()), 3)
    like_for_like = _cohort_total(timings, R2_HEADLINE_SET, "r2")
    # The driver captures only the TAIL of stdout (~1.8 KB) and parses the
    # last JSON line; r3's single fat line (50 queries x all passes) overflowed
    # it and the round recorded "parsed": null (VERDICT r3 "what's wrong" #2).
    # So: full detail goes to an EARLIER line + a sidecar file, and the LAST
    # line is a compact headline guaranteed to fit the capture window.
    detail = {
        "metric": "bench_detail",
        "queries": timings,
        "runs_all_passes": runs,
        "classify_axiom_rows": n_axioms,
        "loadavg_start": load_start,
        "loadavg_end": _loadavg(),
    }
    print(json.dumps(detail, separators=(",", ":")))
    try:
        with open(os.path.join(repo, "BENCH", "bench_detail_latest.json"),
                  "w") as f:
            json.dump(detail, f, indent=1)
    except OSError:
        pass  # read-only checkout: stdout detail line still has everything
    headline = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": {
            k: v for k, v in timings.items() if k in R2_HEADLINE_SET
        },
        "n_queries_total": len(timings),
        "total_like_for_like_r2": like_for_like,
        "total_like_for_like_r3": _cohort_total(
            timings, R3_HEADLINE_SET, "r3"
        ),
        "total_like_for_like_r4": _cohort_total(
            timings, R4_HEADLINE_SET, "r4"
        ),
        "sf": sf,
        "turns": n_turns,
        "turns_per_sec": round(n_turns / pipeline_sec, 1),
        "cpus": cpus,
    }
    line = json.dumps(headline, separators=(",", ":"))
    if len(line) > 1500:  # belt-and-braces: never overflow the tail capture
        headline["queries"] = {}
        line = json.dumps(headline, separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
