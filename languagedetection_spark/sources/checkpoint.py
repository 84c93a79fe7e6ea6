"""Per-partition checkpoint/resume with lineage (north_rule requirement).

The job splits its input into logical partitions (hash buckets of conv_id --
at production scale these are Iceberg partitions), processes each bucket
independently, and records one row per completed bucket in a ``_progress``
JSON-lines table (one atomically-renamed file per bucket):

    run_id, bucket, status, n_rows, n_kept, mean_lang_conf, n_no_lang,
    drop_reasons, model_fingerprint, input_path, finished_at

(the detector-confidence fields appear when the processed output carries
the quality-filter columns; a generic ``process`` gets counts only)

A re-run with the same checkpoint dir skips completed buckets (idempotent
resume after failure); each bucket's output is written to its own
subdirectory, so a partially-written bucket is simply overwritten on retry
(overwrite-by-partition idempotency).  The model fingerprint ties every
bucket's output to the exact broadcast artifact that produced it (lineage).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F


def model_fingerprint(model) -> str:
    """Content fingerprint over a CANONICAL serialization.  (Pickle bytes are
    identity-sensitive: shared interned strings memoize into backreferences,
    so two equal-content models can pickle differently -- verified when a
    JSON round-trip changed the pickle. sort_keys JSON is stable.)"""
    state = model.__getstate__() if hasattr(model, "__getstate__") else model
    blob = json.dumps(state, sort_keys=True, ensure_ascii=False)
    return hashlib.sha256(blob.encode("utf-8")).hexdigest()[:16]


def _progress_path(checkpoint_dir: str) -> str:
    return os.path.join(checkpoint_dir, "_progress")


def load_completed(spark: SparkSession, checkpoint_dir: str,
                   run_id: str) -> set[int]:
    path = _progress_path(checkpoint_dir)
    if not os.path.exists(path):
        return set()
    try:
        df = spark.read.json(path)
        return {
            r["bucket"]
            for r in df.filter(
                (F.col("run_id") == run_id) & (F.col("status") == "done")
            ).select("bucket").collect()
        }
    except Exception:
        return set()


def record_done(checkpoint_dir: str, run_id: str, bucket: int,
                metrics: dict) -> None:
    """Append one JSON line atomically (rename) -- crash-safe bookkeeping."""
    path = _progress_path(checkpoint_dir)
    os.makedirs(path, exist_ok=True)
    row = {"run_id": run_id, "bucket": bucket, "status": "done",
           "finished_at": time.time(), **metrics}
    final = os.path.join(path, f"{run_id}-{bucket}.json")
    tmp = final + ".tmp"
    with open(tmp, "w") as f:
        f.write(json.dumps(row) + "\n")
    os.replace(tmp, final)


def _bucket_metrics(spark: SparkSession, dest: str) -> dict:
    """One aggregate pass over a just-written bucket: row/keep counts plus
    the detector-confidence metrics the north_rule asks for (mean winner
    confidence, abstention count, drop-reason histogram).  Columns are
    optional — a non-filter ``process`` (e.g. the resume unit test's
    length flag) still gets n_rows/n_kept; the real quality_filter output
    gets the full set.  The drop-reason histogram is bounded by the
    reason enum, so the extra groupBy collects O(|reasons|) rows."""
    written = spark.read.parquet(dest)
    cols = set(written.columns)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if "keep" in cols:
        aggs.append(
            F.coalesce(F.sum(F.col("keep").cast("long")), F.lit(0))
            .alias("n_kept")
        )
    if "lang_conf" in cols:
        # avg ignores NULLs (abstained turns); 6 dp keeps the JSON stable
        aggs.append(F.round(F.avg("lang_conf"), 6).alias("mean_lang_conf"))
    if "lang" in cols:
        aggs.append(
            F.coalesce(F.sum(F.col("lang").isNull().cast("long")), F.lit(0))
            .alias("n_no_lang")
        )
    stats = written.agg(*aggs).collect()[0].asDict()
    metrics = {"n_rows": stats["n_rows"], "n_kept": stats.get("n_kept")}
    if "lang_conf" in cols:
        metrics["mean_lang_conf"] = stats["mean_lang_conf"]
    if "lang" in cols:
        metrics["n_no_lang"] = stats["n_no_lang"]
    if "drop_reason" in cols:
        metrics["drop_reasons"] = {
            r["drop_reason"]: r["n"]
            for r in written.filter("drop_reason IS NOT NULL")
            .groupBy("drop_reason").agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
    return metrics


def run_with_checkpoint(
    spark: SparkSession,
    df: DataFrame,
    process,                      # DataFrame -> DataFrame
    output_dir: str,
    checkpoint_dir: str,
    run_id: str,
    n_buckets: int = 16,
    key: str = "conv_id",
    extra_lineage: dict | None = None,
) -> list[int]:
    """Process ``df`` bucket-by-bucket with resume.  Returns the buckets
    processed in THIS invocation (completed ones are skipped).

    Buckets are ``crc32(key) % n_buckets`` so membership is stable across
    runs and engines.  Each bucket filter is pushed into the scan."""
    done = load_completed(spark, checkpoint_dir, run_id)
    bucketed = df.withColumn(
        "_bucket", F.crc32(F.col(key).cast("string")) % n_buckets
    )
    processed = []
    for b in range(n_buckets):
        if b in done:
            continue
        part = bucketed.filter(F.col("_bucket") == b).drop("_bucket")
        out = process(part)
        dest = os.path.join(output_dir, f"bucket={b}")
        out.write.mode("overwrite").parquet(dest)
        record_done(
            checkpoint_dir, run_id, b,
            {**_bucket_metrics(spark, dest), "output": dest,
             **(extra_lineage or {})},
        )
        processed.append(b)
    return processed
