"""Two-parallelism scaling evidence for the webtext CLEANING stack
(same protocol as tools/bench_scaling.py: materialized input so
generation is not measured, steal-gated child runs, min of clean
runs, N vs 4N cores).

The measured job is the corpus_clean shape: C4 line/page rules + PII
redaction (narrow codegen) + corpus-wide exact line dedup (one digest
window shuffle + one doc_id reassembly shuffle) + final count/sum agg.

Usage: python tools/bench_scaling_clean.py [sf_dir] [runs]
Env:   SPARK_GRAFT_CLEAN_SCALE_FACTOR (default 100 → 500k docs at sf0.1)
Appends results to BENCH/BASELINE.md; acceptance: efficiency >= 0.8 on
the (2,8) pair (the bus-headroom instantiation).
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/trefoil_bench")

GEN = r"""
import os, sys
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from trefoil_spark.session import get_spark

sf_dir, factor, path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
spark = get_spark(app_name="gen_lined_docs", master="local[16]",
                  shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(32)
lined = F.concat(F.regexp_replace("text", r"((\S+ ){9}\S+) ", "$1.\n"),
                 F.lit("."))
expanded = docs.select(
    "doc_id", lined.alias("text"),
    F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("_c"),
).select((F.col("doc_id") * factor + F.col("_c")).alias("doc_id"), "text")
expanded.write.mode("overwrite").parquet(path)
print("WROTE", path)
"""

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from trefoil_spark.session import get_spark
from trefoil_spark.operators.cleaning import (
    c4_clean, dedup_paragraphs, redact_pii_col)

cores = int(sys.argv[1]); path = sys.argv[2]; runs = int(sys.argv[3])
spark = get_spark(app_name=f"scaling_clean_{cores}",
                  master=f"local[{cores}]", shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")

JOB = os.environ.get("SPARK_GRAFT_SCALING_JOB", "clean")

def job():
    docs = spark.read.parquet(path)
    if JOB == "pack":
        from trefoil_spark.operators.seqpack import pack_sequences

        packed = pack_sequences(docs, 2048)
        return packed.agg(F.count("*").alias("n_seqs"),
                          F.sum("n_docs").alias("n_doc_frags"))
    cleaned = c4_clean(docs).withColumn("text", redact_pii_col("text"))
    deduped = dedup_paragraphs(cleaned, split_pat=r"\n+", join_sep="\n")
    return deduped.agg(F.count("*").alias("n_docs"),
                       F.sum(F.length("text")).alias("n_chars"))

def force(df):
    df.write.format("noop").mode("overwrite").save()

def cpu_ticks():
    with open("/proc/stat") as f:
        p = f.readline().split()
    vals = [int(x) for x in p[1:9]]
    return vals[7], sum(vals)

n = spark.read.parquet(path).count()
force(job())  # warmup, discarded
samples = []
attempts = 0
steal_max = float(os.environ.get("SPARK_GRAFT_BENCH_STEAL_MAX", "3.0"))
while (len([s for s in samples if s[1] <= steal_max]) < runs
       and attempts < 3 * runs):
    s0, j0 = cpu_ticks()
    t0 = time.perf_counter()
    force(job())
    wall = time.perf_counter() - t0
    s1, j1 = cpu_ticks()
    steal = 100.0 * (s1 - s0) / max(1, j1 - j0)
    samples.append((wall, steal))
    attempts += 1
clean = sorted(s for s in samples if s[1] <= steal_max) or sorted(samples)
best = clean[0]
print(json.dumps({"cores": cores, "sec": best[0], "rows": n,
                  "steal_pct": round(best[1], 2), "attempts": attempts,
                  "clean_runs": len(clean)}))
"""


def ensure_docs(sf_dir: str, factor: int) -> str:
    tag = sf_dir.rstrip("/").split("/")[-1]
    path = os.path.join(CACHE, f"lined_docs_{tag}_f{factor}.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        out = subprocess.run(
            [sys.executable, "-c", GEN % {"repo": REPO}, sf_dir,
             str(factor), path],
            capture_output=True, text=True, cwd=REPO, timeout=1200,
        )
        if "WROTE" not in out.stdout:
            print(out.stdout[-2000:], out.stderr[-2000:])
            raise SystemExit(1)
    return path


def run_at(cores: int, path: str, runs: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD % {"repo": REPO}, str(cores), path,
         str(runs)],
        capture_output=True, text=True, cwd=REPO, timeout=1800,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        print(out.stdout[-2000:], out.stderr[-2000:])
        raise SystemExit(1)
    return json.loads(lines[-1])


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    factor = int(os.environ.get("SPARK_GRAFT_CLEAN_SCALE_FACTOR", "100"))
    path = ensure_docs(sf_dir, factor)
    results = {}
    for small, big in ((2, 8), (4, 16)):
        a = run_at(small, path, runs)
        b = run_at(big, path, runs)
        speedup = a["sec"] / b["sec"]
        eff = speedup / (big / small)
        results[f"({small},{big})"] = {
            "small": a, "big": b,
            "speedup": round(speedup, 3), "efficiency": round(eff, 3),
        }
        print(json.dumps(results[f"({small},{big})"]))
    stamp = datetime.datetime.now(datetime.timezone.utc).isoformat(
        timespec="seconds")
    jobname = os.environ.get("SPARK_GRAFT_SCALING_JOB", "clean")
    desc = ("C4 + PII + corpus-wide line dedup"
            if jobname == "clean" else
            "pack_sequences seq_len=2048 (bucketed two-phase scan)")
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n### {jobname}-stack scaling run ({stamp})\n\n"
            f"Job: {desc} over "
            f"{results['(2,8)']['small']['rows']} lined docs "
            f"(factor {factor}); steal-gated min-of-clean protocol as "
            f"the flagship runs.\n\n"
            "| pair | small s | big s | speedup | efficiency |\n"
            "|---|---|---|---|---|\n"
            + "".join(
                f"| {k} | {v['small']['sec']:.2f} | {v['big']['sec']:.2f} "
                f"| {v['speedup']} | {v['efficiency']} |\n"
                for k, v in results.items()
            )
            + "\nRaw: " + json.dumps(results) + "\n"
        )
    print("appended to BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
