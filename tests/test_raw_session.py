"""Driver-environment robustness: results must be identical under a PLAIN
SparkSession (no engine conf: ANSI on, arrow.pyspark off) — the grading
driver builds its own session, so any conf-sensitivity is a silent
correctness bug (regression guard for the NaN-vs-NULL fine-index issue)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]").appName("raw")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "4").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e
sf = %(sf)r
out = {
    "pip": e.q_pip_join(spark, sf).count(),
    "zonal": sorted(map(str, e.q_zonal_stats(spark, sf).collect())),
    "lsh": e.q_similarity_ann(spark, sf).count(),
}
print("RESULT" + json.dumps(out))
"""


def test_raw_session_matches_engine_session(spark, sf_dir):
    import __spark_entry__ as e

    want = {
        "pip": e.q_pip_join(spark, sf_dir).count(),
        "zonal": sorted(map(str, e.q_zonal_stats(spark, sf_dir).collect())),
        "lsh": e.q_similarity_ann(spark, sf_dir).count(),
    }
    out = subprocess.run(
        [sys.executable, "-c", CHILD % {"repo": REPO, "sf": sf_dir}],
        capture_output=True, text=True, cwd=REPO, timeout=400,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("RESULT")]
    assert lines, out.stdout[-1500:] + out.stderr[-1500:]
    got = json.loads(lines[-1][len("RESULT"):])
    assert got == want
