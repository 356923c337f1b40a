"""Per-ring timing probe for the kNN suite queries (VERDICT r4 item 6).

BENCH_r* showed knn_join_cells swinging 1.62s ↔ 2.62s on identical code.
The evidence said box noise, but the ring-expansion loop is the one suite
query with driver-side iteration — this probe decomposes the time so the
spread can be attributed: per-ring knn/guard stage seconds for the
adaptive loop, plus N repetitions of the bench's single-shot
knn_join_cells query with per-run wall time and load average.

If the spread shows up ACROSS runs while the WITHIN-run ring profile stays
flat-shaped, it's scheduling/box noise; a straggler/skew tail would show
as one ring's knn stage blowing up inside a slow run.

Run: python tools/bench_knn_rings.py   (appends a JSON line to stdout;
paste into BENCH/BASELINE.md's knn-variance note)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    from pyspark.sql import functions as F

    import __spark_entry__ as e
    from trefoil_spark.operators.knn import knn_join_adaptive, knn_join_cells
    from trefoil_spark.session import get_spark

    spark = get_spark(
        app_name="bench_knn_rings",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    pages = e._pages(spark, sf_dir).select("doc_id", "lon", "lat")
    queries = pages.filter(F.col("doc_id") % 100 == 0)

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # warmup
    force(knn_join_cells(pages, queries, k=5, res=6, ring=1))

    out_runs = []
    for r in range(runs):
        # single-shot cells query (the bench suite entry)
        t0 = time.perf_counter()
        force(knn_join_cells(pages, queries, k=5, res=6, ring=1))
        cells_sec = time.perf_counter() - t0

        # adaptive ring-expansion loop with per-ring stage seconds
        timings: list = []
        t0 = time.perf_counter()
        force(knn_join_adaptive(pages, queries, k=5, res=6, timings=timings))
        adaptive_sec = time.perf_counter() - t0
        out_runs.append(
            {
                "run": r,
                "load_1m": round(os.getloadavg()[0], 2),
                "cells_sec": round(cells_sec, 3),
                "adaptive_sec": round(adaptive_sec, 3),
                "rings": {name: round(sec, 3) for name, sec in timings},
            }
        )

    print(json.dumps({"sf": sf_dir, "cpus": int(cpus), "runs": out_runs}))


if __name__ == "__main__":
    main()
