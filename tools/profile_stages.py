"""Stage-level profile of one headline query (r8 measurement aid).

Runs a query with the UI enabled, then prints per-stage wall/task times
from the REST API so the expensive operator is identifiable without a
live UI. Usage: python tools/profile_stages.py <query> [runs]
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from trefoil_spark.session import get_spark

    spark = get_spark(
        app_name=f"stageprof_{name}",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4079"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = bench.headline_queries()
    fn = qs[name]
    bench.force(fn(spark, sf_dir))  # warmup

    sc = spark.sparkContext
    first_job = sc._jsc.sc().dagScheduler().nextJobId()
    import time
    t0 = time.perf_counter()
    for _ in range(runs):
        bench.force(fn(spark, sf_dir))
    wall = time.perf_counter() - t0

    app_id = sc.applicationId
    base = f"http://localhost:4079/api/v1/applications/{app_id}"
    stages = json.load(urllib.request.urlopen(f"{base}/stages?status=complete"))
    jobs = json.load(urllib.request.urlopen(f"{base}/jobs"))
    recent_jobs = [j for j in jobs if j["jobId"] >= first_job]
    stage_ids = {s for j in recent_jobs for s in j["stageIds"]}
    rows = []
    for s in stages:
        if s["stageId"] not in stage_ids:
            continue
        dur = s.get("executorRunTime", 0)
        rows.append((
            s["stageId"], s["name"].split("\n")[0][:70], s["numCompleteTasks"],
            dur, s.get("executorCpuTime", 0) // 1_000_000,
            s.get("shuffleReadBytes", 0), s.get("shuffleWriteBytes", 0),
            s.get("inputBytes", 0),
        ))
    rows.sort(key=lambda r: -r[3])
    print(f"{name}: wall {wall:.2f}s for {runs} runs "
          f"({len(recent_jobs)} jobs, {len(rows)} stages)")
    print(f"{'stage':>5} {'tasks':>5} {'runMs':>7} {'cpuMs':>7} "
          f"{'shR':>9} {'shW':>9} {'input':>10}  name")
    for sid, nm, nt, run, cpu, shr, shw, inp in rows[:25]:
        print(f"{sid:>5} {nt:>5} {run:>7} {cpu:>7} {shr:>9} {shw:>9} {inp:>10}  {nm}")


if __name__ == "__main__":
    main()
