"""The north rule's deployment shape: spark-submit --py-files runs the
engine from the packaged zip alone (no repo on sys.path)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles(tmp_path):
    zip_path = str(tmp_path / "trefoil_spark.zip")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles.py"), zip_path],
        capture_output=True, text=True, timeout=60,
    )
    assert zip_path in out.stdout
    run = subprocess.run(
        [
            "spark-submit", "--master", "local[4]",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "submit_job.py"),
            "/root/testdata/sf0.001", "zonal_stats",
        ],
        capture_output=True, text=True, timeout=240,
        cwd=str(tmp_path),  # NOT the repo: imports must come from the zip
    )
    lines = [l for l in run.stdout.splitlines() if l.startswith("{")]
    assert lines, run.stdout[-2000:] + run.stderr[-2000:]
    res = json.loads(lines[-1])
    assert res["rows"] == 3 and res["query"] == "zonal_stats"


def test_cli_subprocess_header_only():
    """`python -m trefoil_spark describe` in a REAL subprocess — the
    header-only commands must answer without starting the JVM (fast)."""
    import json
    import subprocess
    import sys
    import tempfile
    import time

    import numpy as np

    from trefoil_spark.sources.netcdf3 import write_netcdf3

    with tempfile.TemporaryDirectory() as d:
        nc = f"{d}/g.nc"
        write_netcdf3(
            nc, {"y": 4, "x": 5},
            {"v": (("y", "x"), {}, np.zeros((4, 5), np.float32))},
        )
        t0 = time.time()
        out = subprocess.run(
            [sys.executable, "-m", "trefoil_spark", "describe", nc],
            capture_output=True, text=True, cwd="/root/repo", timeout=60,
        )
        assert out.returncode == 0, out.stderr[-500:]
        info = json.loads(out.stdout)
        assert info["dimensions"] == {"y": 4, "x": 5}
        assert time.time() - t0 < 30  # no SparkSession spin-up
