"""Per-query decomposition of the headline bench (r8 measurement aid).

For each headline query, measures:
  build_s    — Python-side DataFrame construction (fn call)
  explain_s  — first .explain (analysis + optimization, plan-size proxy)
  exec_s     — min of N noop-sink executions of a pre-built DataFrame
  e2e_s      — min of N full (build + execute) runs, i.e. what bench.py times

Also dumps .explain('formatted') to plans/r08/<name>_<tag>.txt.

Usage: python tools/profile_headline.py [tag] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = sys.argv[2:] or None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    from trefoil_spark.session import get_spark

    spark = get_spark(
        app_name="trefoil_profile",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = bench.headline_queries()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}

    plans_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r08")
    os.makedirs(plans_dir, exist_ok=True)

    # warmup all
    for name, fn in qs.items():
        bench.force(fn(spark, sf_dir))

    out = {}
    for name, fn in qs.items():
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        build_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        explain_s = time.perf_counter() - t0
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)

        exec_times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            bench.force(df)
            exec_times.append(time.perf_counter() - t0)

        e2e_times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            bench.force(fn(spark, sf_dir))
            e2e_times.append(time.perf_counter() - t0)

        out[name] = {
            "build_s": round(build_s, 4),
            "explain_s": round(explain_s, 4),
            "exec_s": round(min(exec_times), 4),
            "e2e_s": round(min(e2e_times), 4),
        }
        print(json.dumps({name: out[name]}), flush=True)

    print(json.dumps({"tag": tag, "profile": out}))


if __name__ == "__main__":
    main()
