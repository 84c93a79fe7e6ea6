"""spark-submit entry point for the quality-filter job.

    spark-submit --py-files languagedetection_spark.zip \\
        -m languagedetection_spark.jobs.filter_job \\
        --input /path/transcripts.parquet --output /path/out \\
        --checkpoint /path/ckpt [--corpus /path/labeled.parquet] \\
        [--buckets 16] [--run-id r1] [--master local[8]]

Reads transcripts (Parquet path or Iceberg identifier), builds/loads the
frozen model, and processes per-conv_id hash buckets with checkpoint/resume
and per-bucket lineage (sources/checkpoint.py).  Killing the job mid-run and
re-submitting with the same --checkpoint/--run-id resumes exactly where it
stopped; completed buckets are never recomputed.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_model(spark, corpus_path: str | None):
    from ..fixtures.generate import gen_labeled_corpus
    from ..functions.kernels import FilterModel

    if corpus_path:
        # distributed build: the corpus is never collected -- only the
        # model-sized vocab/trigram aggregates reach the driver, so an
        # arbitrarily large labeled corpus works (bit-identical to
        # FilterModel.from_corpus, pinned in tests/test_training_fold.py)
        from ..operators.training import build_model_distributed

        corpus = spark.read.parquet(corpus_path).select("language", "text")
        return build_model_distributed(spark, corpus)
    rows = [(lang, text) for text, lang, _ in gen_labeled_corpus()]
    return FilterModel.from_corpus(rows)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--corpus", default=None,
                   help="labeled corpus parquet (language, text); "
                        "default: the seed-42 fixture corpus")
    p.add_argument("--model-artifact", default=None,
                   help="load the frozen model from this artifact instead "
                        "of training from --corpus; if the file does not "
                        "exist, the trained model is saved there")
    p.add_argument("--buckets", type=int, default=16)
    p.add_argument("--run-id", default="r1")
    p.add_argument("--master", default=None)
    p.add_argument("--conv-report", default=None,
                   help="also write the conversation-level rollup (keep "
                        "rate, dominant language, mean perplexity per "
                        "conv_id) to this parquet path, computed from the "
                        "completed per-turn output")
    p.add_argument("--fail-after", type=int, default=None,
                   help="TESTING: raise after N buckets to exercise resume")
    p.add_argument("--dedup", choices=["exact", "minhash"], default=None,
                   help="corpus-wide dedup stage before scoring: 'exact' "
                        "keeps the (conv_id, turn_idx)-minimal turn per "
                        "distinct text; 'minhash' keeps it per NEAR-dup "
                        "cluster (LSH candidates, exact-Jaccard verify at "
                        "--dedup-threshold, connected components) -- a "
                        "strict superset of 'exact' (batch mode only; the "
                        "streaming mode's analogue is stateful "
                        "dropDuplicates)")
    p.add_argument("--dedup-threshold", type=float, default=0.8,
                   help="verified-Jaccard threshold for --dedup minhash "
                        "(default 0.8)")
    p.add_argument("--dedup-hash-family", choices=["md5", "xxhash64"],
                   default="md5",
                   help="MinHash signature kernel for --dedup minhash: "
                        "'md5' (oracle-portable Arrow kernel, default) or "
                        "'xxhash64' (JVM-native, Python-worker-free; "
                        "same verify contract, different LSH randomness)")
    p.add_argument("--bucketed-table", default=None,
                   help="after all buckets complete, additionally compact "
                        "the KEPT turns into a bucketed + per-bucket-"
                        "sorted catalog table (bucketBy conv_id, sortBy "
                        "conv_id, turn_idx) so every downstream conv-"
                        "level join/agg scans shuffle-free "
                        "(sources/sinks.py); batch mode only")
    p.add_argument("--warehouse-dir", default=None,
                   help="spark.sql.warehouse.dir for --bucketed-table "
                        "(default: Spark's default warehouse)")
    p.add_argument("--streaming", action="store_true",
                   help="consume --input as a file stream (availableNow "
                        "trigger): parquet sink + streaming checkpoint "
                        "gives exactly-once restarts instead of the "
                        "bucketed batch writer")
    args = p.parse_args(argv)

    if args.conv_report:
        import os as _os

        # a conv-report target nested under --output would be re-ingested
        # as input on a rerun (streaming reads the sink dir whole; batch
        # formerly globbed around it) and corrupt the rollup -- reject it
        # up-front in BOTH modes
        _out = _os.path.realpath(args.output)
        _rep = _os.path.realpath(args.conv_report)
        if _rep == _out or _rep.startswith(_out + _os.sep):
            p.error(f"--conv-report ({args.conv_report}) must not be "
                    f"nested under --output ({args.output})")

    # mode-combination errors BEFORE any JVM spins up
    if args.streaming and args.dedup:
        p.error("--dedup is a batch stage; streaming mode dedups via "
                "stateful dropDuplicates (see streaming_dedup)")
    if args.streaming and args.bucketed_table:
        p.error("--bucketed-table is a batch compaction stage; for a "
                "stream, run it as a separate batch job over the sink")

    from pyspark.sql import SparkSession

    from ..functions.udfs import broadcast_model
    from ..operators.quality_filter import quality_filter
    from ..plans.session import get_spark
    from ..sources.checkpoint import model_fingerprint, run_with_checkpoint
    from ..sources.readers import read_transcripts

    if args.warehouse_dir:
        # getOrCreate() silently ignores builder conf when a session
        # already exists in this process -- the bucketed table would land
        # in the WRONG warehouse while the job output claims success
        active = SparkSession.getActiveSession()
        if active is not None and active.conf.get(
                "spark.sql.warehouse.dir") != args.warehouse_dir:
            p.error("--warehouse-dir requires a fresh process: an active "
                    "SparkSession already pins spark.sql.warehouse.dir to "
                    f"{active.conf.get('spark.sql.warehouse.dir')}")

    spark = get_spark(
        master=args.master, app_name="ld-filter-job",
        extra_conf=(
            {"spark.sql.warehouse.dir": args.warehouse_dir}
            if args.warehouse_dir else None
        ),
    )
    import os

    if args.model_artifact and os.path.exists(args.model_artifact):
        from ..model.artifacts import load_model

        model = load_model(args.model_artifact)
    else:
        model = build_model(spark, args.corpus)
        if args.model_artifact:
            from ..model.artifacts import save_model

            save_model(model, args.model_artifact)
    fp = model_fingerprint(model)
    bc = broadcast_model(spark, model)

    if args.streaming:
        from ..streaming.pipeline import (
            run_to_parquet,
            stream_transcripts,
            streaming_quality_filter,
        )

        stream = stream_transcripts(spark, args.input)
        run_to_parquet(
            streaming_quality_filter(stream, bc), args.output,
            os.path.join(args.checkpoint, "stream"),
        )
        out = {"run_id": args.run_id, "mode": "streaming",
               "model_fingerprint": fp}
        if args.conv_report:
            from ..operators.quality_filter import conv_report

            decided = spark.read.parquet(args.output)
            conv_report(decided).write.parquet(
                args.conv_report, mode="overwrite"
            )
            out["conv_report_rows"] = (
                spark.read.parquet(args.conv_report).count()
            )
        print(json.dumps(out))
        spark.stop()
        return 0

    df = read_transcripts(spark, args.input)
    if args.dedup == "exact":
        from ..operators.dedup import dedup_exact_keep_first

        df = dedup_exact_keep_first(df)
    elif args.dedup == "minhash":
        from ..operators.dedup import dedup_minhash_keep_first

        df = dedup_minhash_keep_first(df, threshold=args.dedup_threshold,
                                      hash_family=args.dedup_hash_family)

    count = {"n": 0}

    def process(part):
        count["n"] += 1
        if args.fail_after is not None and count["n"] > args.fail_after:
            raise RuntimeError(f"injected failure after {args.fail_after} buckets")
        return quality_filter(part, bc)

    processed = run_with_checkpoint(
        spark, df, process, args.output, args.checkpoint, args.run_id,
        n_buckets=args.buckets,
        extra_lineage={"model_fingerprint": fp, "input_path": args.input},
    )
    # THIS run's bucket dirs only (0..buckets-1), not a bare bucket=* glob:
    # a previous run on the same --output with a LARGER --buckets count
    # leaves stale bucket dirs beyond this run's range, and globbing them
    # in would duplicate every turn they hold (each turn is also in this
    # run's rewritten buckets).  Completed == all of this run's dirs exist.
    this_run_dirs = [
        d for b in range(args.buckets)
        if os.path.isdir(d := os.path.join(args.output, f"bucket={b}"))
    ]
    n_convs = None
    if args.conv_report:
        from ..operators.quality_filter import conv_report

        if this_run_dirs:
            decided = spark.read.parquet(*this_run_dirs)
            report = conv_report(decided)
            report.write.parquet(args.conv_report, mode="overwrite")
            n_convs = spark.read.parquet(args.conv_report).count()
        else:
            print(f"conv-report skipped: no completed buckets under "
                  f"{args.output}", file=sys.stderr)
    out = {"run_id": args.run_id, "processed_buckets": processed,
           "model_fingerprint": fp}
    if n_convs is not None:
        out["conv_report_rows"] = n_convs
    if args.bucketed_table:
        from ..operators.quality_filter import kept_turns
        from ..sources.sinks import write_bucketed

        if this_run_dirs:
            decided = spark.read.parquet(*this_run_dirs)
            write_bucketed(
                kept_turns(decided), args.bucketed_table,
                n_buckets=args.buckets,
            )
            out["bucketed_table"] = args.bucketed_table
        else:
            print(f"bucketed-table skipped: no completed buckets under "
                  f"{args.output}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
