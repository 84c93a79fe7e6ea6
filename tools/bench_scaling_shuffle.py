"""N -> 4N scaling for the SHUFFLE-HEAVY operator family.

The headline scaling evidence (bench_scaling.py) is deliberately map-only;
this companion measures the operators whose cost is dominated by exchanges:

* dedup_minhash_lsh  -- signatures -> band join -> exact-Jaccard verify
* inverted_index agg -- two corpus-wide groupBys (token -> posting stats)
* segment_dedup      -- segment hash shuffle (keeper election + probe) +
                        per-doc reassembly agg

Same protocol as the headline pair: each level runs in a FRESH JVM
(subprocess), one warm pass then best-of-2 timed passes, N/4N pairs
interleaved so co-tenant drift hits both levels equally.  Input is the
775k-turn bench corpus re-shaped into a documents table.

Usage: python tools/bench_scaling_shuffle.py   (env BENCH_SCALING_N,
BENCH_SCALING_CONVS as in bench_scaling.py; prints one JSON line)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
import bench
from pyspark.sql import functions as F
from languagedetection_spark.plans.session import get_spark

cpus = int(sys.argv[1])
job = sys.argv[2]
n_convs = int(os.environ.get("BENCH_SCALING_CONVS", "75000"))
bench.TRANSCRIPT_CONVS = n_convs
path = bench._ensure_transcripts(
    os.path.join({repo!r}, ".bench", f"transcripts_{{n_convs}}.parquet"))
docs_dir = os.path.join({repo!r}, ".bench", f"docs_{{n_convs}}")
spark = get_spark(master=f"local[{{cpus}}]", shuffle_partitions=cpus,
                  app_name=f"ld-shuffle-scaling-{{cpus}}",
                  extra_conf={{"spark.sql.files.maxPartitionBytes": str(1 << 20),
                              "spark.sql.files.openCostInBytes": str(1 << 18)}})
if not os.path.exists(os.path.join(docs_dir, "documents.parquet")):
    (spark.read.parquet(path)
     .select(F.xxhash64("conv_id", "turn_idx").alias("doc_id"),
             F.col("text"))
     .write.mode("overwrite")
     .parquet(os.path.join(docs_dir, "documents.parquet")))

def run_minhash():
    from languagedetection_spark.operators.dedup import dedup_minhash_lsh_df
    d = spark.read.parquet(os.path.join(docs_dir, "documents.parquet"))
    dedup_minhash_lsh_df(d).write.format("noop").mode("overwrite").save()

def run_inverted():
    d = spark.read.parquet(os.path.join(docs_dir, "documents.parquet"))
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    (tf.groupBy("term")
     .agg(F.count("*").alias("df"), F.sum("tf").alias("total_tf"),
          F.min("doc_id").alias("first_doc"))
     .write.format("noop").mode("overwrite").save())

def run_segment():
    from languagedetection_spark.entry_queries import segment_dedup
    segment_dedup(spark, docs_dir).write.format("noop") \
        .mode("overwrite").save()

jobs = {{"minhash": run_minhash, "inverted": run_inverted,
         "segment": run_segment}}
fn = jobs[job]
fn()  # warm pass (JIT, page cache, python workers)
secs = min((lambda t0: (fn(), time.time() - t0)[1])(time.time())
           for _ in range(2))
print(json.dumps({{"cpus": cpus, "job": job, "sec": round(secs, 3)}}))
spark.stop()
"""


def run_at(cpus: int, job: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=REPO), str(cpus), job],
        capture_output=True, text=True, timeout=1800,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    n = int(os.environ.get("BENCH_SCALING_N", "2"))
    load = open("/proc/loadavg").read().split()[0]
    result: dict = {"external_load": load, "n": n}
    for job in ("minhash", "inverted", "segment"):
        best: dict[int, float] = {}
        pair_effs: list[float] = []
        for _ in range(2):  # interleaved pairs
            pair: dict[int, float] = {}
            for cpus in (n, n * 4):
                r = run_at(cpus, job)
                pair[cpus] = r["sec"]
                if cpus not in best or r["sec"] < best[cpus]:
                    best[cpus] = r["sec"]
            # within-pair ratio: holds the co-tenant window (nearly)
            # constant; cross-pair best-per-level can couple a lucky N
            # window with an unlucky 4N one and distort either direction
            pair_effs.append(round(pair[n] / (4 * pair[n * 4]), 3))
        eff = best[n] / (4 * best[n * 4])
        result[job] = {f"local{n}_sec": best[n],
                       f"local{n * 4}_sec": best[n * 4],
                       "efficiency": round(eff, 3),
                       "pair_efficiencies": pair_effs,
                       "best_pair_efficiency": max(pair_effs)}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
