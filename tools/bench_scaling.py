"""Two-parallelism scaling evidence (BASELINE.md protocol).

Runs the identical flagship job at local[8] and local[32] on the same
input in separate subprocesses (clean JVM each), reports throughput at
both plus efficiency = (T4/T16)/4, and appends results to
BENCH/BASELINE.md. Acceptance: efficiency >= 0.8 (north_rule's N vs 4N
executor criterion, evidenced per the sandbox protocol).

Usage: python tools/bench_scaling.py [sf_dir] [runs]
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from trefoil_spark.session import get_spark
from trefoil_spark.sources.pages import build_pages_scaled
from trefoil_spark.sources.zones import ZONE_LAYER
from trefoil_spark.operators.pip_join import pip_join
from trefoil_spark.operators.zonal import zonal_statistics

cores = int(sys.argv[1]); sf_dir = sys.argv[2]; runs = int(sys.argv[3])
factor = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "400"))
spark = get_spark(app_name=f"scaling_{cores}", master=f"local[{cores}]",
                  shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")

def flagship():
    # identical job at every parallelism: scaled pages -> PIP join -> zonal
    pages = build_pages_scaled(spark, sf_dir, factor)
    joined = pip_join(pages, ZONE_LAYER)
    return zonal_statistics(
        joined.withColumn("n_chars", F.length("text")), "zone_value", "n_chars"
    )

def force(df):
    df.write.format("noop").mode("overwrite").save()

n = spark.read.parquet(f"{sf_dir}/documents.parquet").count() * factor
force(flagship())  # warmup, discarded
ts = []
for _ in range(runs):
    t0 = time.perf_counter()
    force(flagship())
    ts.append(time.perf_counter() - t0)
ts.sort()
print(json.dumps({"cores": cores, "sec": ts[len(ts)//2], "rows": n}))
"""


def run_at(cores: int, sf_dir: str, runs: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD % {"repo": REPO}, str(cores), sf_dir, str(runs)],
        capture_output=True, text=True, cwd=REPO, timeout=1200,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    # N vs 4N on one box: each Spark task with a Python stage needs a JVM
    # thread AND a Python worker, so local[16] already saturates the 32
    # hardware cores (16+16). local[32] would oversubscribe 2x and measure
    # scheduler thrash, not scaling. Hence the pair (4, 16).
    r8 = run_at(4, sf_dir, runs)
    r32 = run_at(16, sf_dir, runs)
    t8, t32 = r8["sec"], r32["sec"]
    thr8, thr32 = r8["rows"] / t8, r32["rows"] / t32
    eff = (t8 / t32) / 4.0

    result = {
        "sf_dir": sf_dir,
        "rows": r8["rows"],
        "local4_sec": round(t8, 4),
        "local16_sec": round(t32, 4),
        "local4_rows_per_sec": round(thr8, 1),
        "local16_rows_per_sec": round(thr32, 1),
        "scaling_efficiency_4_to_16": round(eff, 3),
        "accept_ge_0.8": eff >= 0.8,
    }
    print(json.dumps(result))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    stamp = datetime.datetime.now(datetime.timezone.utc).isoformat(timespec="seconds")
    header_needed = not os.path.exists(path)
    with open(path, "a") as f:
        if header_needed:
            f.write(
                "# BENCH/BASELINE.md — measured scaling evidence\n\n"
                "Protocol (BASELINE.md): identical flagship job (zonal-stats"
                " + PIP join pipeline) at local[4] vs local[16], same input,"
                " median of N runs after a discarded warmup; efficiency ="
                " (T8/T32)/4; acceptance >= 0.8.\n\n"
                "| when (UTC) | sf_dir | rows | T4 (s) | T16 (s) | rows/s @4 | rows/s @16 | efficiency | pass |\n"
                "|---|---|---|---|---|---|---|---|---|\n"
            )
        f.write(
            f"| {stamp} | {sf_dir} | {r8['rows']} | {t8:.3f} | {t32:.3f} "
            f"| {thr8:.0f} | {thr32:.0f} | {eff:.3f} | {'YES' if eff >= 0.8 else 'NO'} |\n"
        )


if __name__ == "__main__":
    main()
