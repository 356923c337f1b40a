"""Diagnose what limits 8→32 core scaling of the flagship job.

Stages probed independently at two parallelism levels:
  A. full flagship (text carried)
  B. flagship with n_chars precomputed (no string bandwidth)
  C. expansion + cell assign only (pure JVM codegen)
  D. expansion + PIP winner UDF (no agg)
Usage: python tools/probe_scaling.py
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from trefoil_spark.session import get_spark
from trefoil_spark.sources.pages import pages_cte_sql
from trefoil_spark.sources.zones import ZONE_LAYER
from trefoil_spark.operators.pip_join import pip_join, cell_col
from trefoil_spark.operators.zonal import zonal_statistics

cores = int(sys.argv[1]); which = sys.argv[2]; factor = 4000
spark = get_spark(app_name="probe", master=f"local[{cores}]", shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
par = spark.sparkContext.defaultParallelism
reps = spark.range(0, factor, numPartitions=min(factor, par * 4)).withColumnRenamed("id", "rep")

def expansion(cols):
    wide = reps.join(F.broadcast(docs)).selectExpr(
        f"doc_id*{factor}+rep AS doc_id", *cols)
    wide.createOrReplaceTempView("_d")
    return wide

def build(which):
    if which == "A":
        expansion(["text", "lang", "source"])
        pages = spark.sql(pages_cte_sql("_d"))
        j = pip_join(pages, ZONE_LAYER)
        return zonal_statistics(j.withColumn("n_chars", F.length("text")), "zone_value", "n_chars")
    if which == "B":
        expansion(["n_chars", "lang", "source"])
        pages = spark.sql(pages_cte_sql("_d", passthrough=("n_chars", "lang")))
        j = pip_join(pages, ZONE_LAYER)
        return zonal_statistics(j, "zone_value", "n_chars")
    if which == "C":
        expansion(["n_chars", "source"])
        pages = spark.sql(pages_cte_sql("_d", passthrough=("n_chars",)))
        return pages.select(F.sum("cell").alias("s"))
    if which == "D":
        expansion(["n_chars", "source"])
        pages = spark.sql(pages_cte_sql("_d", passthrough=("n_chars",)))
        return pip_join(pages, ZONE_LAYER).select(F.sum("feature_id").alias("s"))

def force(df):
    df.write.format("noop").mode("overwrite").save()

force(build(which))
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    force(build(which))
    ts.append(time.perf_counter() - t0)
ts.sort()
print(json.dumps({"cores": cores, "which": which, "sec": ts[1]}))
"""


def run(cores, which):
    out = subprocess.run(
        [sys.executable, "-c", CHILD % {"repo": REPO}, str(cores), which],
        capture_output=True, text=True, cwd=REPO, timeout=1200,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        print(out.stdout[-2000:], out.stderr[-2000:])
        raise SystemExit(1)
    return json.loads(lines[-1])


for which in ["A", "B", "C", "D"]:
    r8 = run(8, which)
    r32 = run(32, which)
    eff = r8["sec"] / r32["sec"] / 4
    print(
        f"{which}: T8={r8['sec']:.2f}s T32={r32['sec']:.2f}s "
        f"speedup={r8['sec']/r32['sec']:.2f}x eff={eff:.2f}"
    )
