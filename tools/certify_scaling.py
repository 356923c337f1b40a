"""Certify the (4,16) scaling pair in a verified-quiet window (r6).

VERDICT r5 item 6: the (4,16) N-vs-4N reading has oscillated 0.55-0.70
across rounds on code-identical flagship paths, and r5's third session
was explicitly steal-polluted (6.87% steal, gate refused after 9
retries).  local[16] saturates all 32 hardware threads (16 JVM + 16
Python workers), the configuration maximally exposed to co-tenant bus
drag that steal sampling cannot see.  This tool runs ONE certification
session gated on BOTH signals:

  - steal <= 1.0%% on every kept run (SPARK_GRAFT_BENCH_STEAL_MAX=1.0
    passed to the bench_scaling child);
  - the STREAM-add memory-bandwidth probe (bench._bandwidth_probe),
    sampled at every stage boundary, within 10%% of the session's best
    sample — bus drag flags the session even when steal reads zero.

It also runs the ALU probe pair (embarrassingly parallel, zero-memory
JVM loop) in the same window: any (4,16) inefficiency there is
hardware (frequency scaling under 32-thread load / hypervisor caps),
not software, so the certified reading reports BOTH the raw efficiency
and the ALU-normalized one.  If the raw number stays < 0.8 in a
certified-quiet window, the normalized number is the official reading
and the question is closed as hardware-bound (brief item 6).

Usage: python tools/certify_scaling.py [attempts] [runs]
Appends a certification block to BENCH/BASELINE.md. Must run EXCLUSIVELY
(no concurrent Spark on the box).
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import _bandwidth_probe  # noqa: E402
from tools.bench_scaling import ensure_pages, run_at  # noqa: E402

ALU = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from trefoil_spark.session import get_spark

def ticks():
    with open("/proc/stat") as f:
        p = f.readline().split()
    v = [int(x) for x in p[1:9]]
    return v[7], sum(v)

cores = int(sys.argv[1]); runs = int(sys.argv[2])
spark = get_spark(app_name=f"alu_{cores}", master=f"local[{cores}]",
                  shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")

def job():
    spark.range(0, 40_000_000_000, 1, cores * 4).select(
        F.expr("bit_xor(xxhash64(id))").alias("s")).collect()

job()  # warmup
best, best_steal = None, None
for _ in range(runs):
    s0, j0 = ticks(); t0 = time.perf_counter()
    job()
    w = time.perf_counter() - t0
    s1, j1 = ticks()
    st = 100.0 * (s1 - s0) / max(1, j1 - j0)
    if best is None or w < best:
        best, best_steal = w, st
print(json.dumps({"cores": cores, "sec": round(best, 2),
                  "steal_pct": round(best_steal, 2)}))
"""


def alu_at(cores: int, runs: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", ALU % {"repo": REPO}, str(cores), str(runs)],
        capture_output=True, text=True, cwd=REPO, timeout=900,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        print(out.stdout[-1500:], out.stderr[-1500:])
        raise SystemExit(1)
    return json.loads(lines[-1])


def one_session(path: str, runs: int) -> dict:
    bw = [_bandwidth_probe()]
    a4 = alu_at(4, runs)
    bw.append(_bandwidth_probe())
    a16 = alu_at(16, runs)
    bw.append(_bandwidth_probe())
    f4 = run_at(4, path, runs)
    bw.append(_bandwidth_probe())
    f16 = run_at(16, path, runs)
    bw.append(_bandwidth_probe())
    raw = (f4["sec"] / f16["sec"]) / 4.0
    alu_eff = (a4["sec"] / a16["sec"]) / 4.0
    steals = [a4["steal_pct"], a16["steal_pct"],
              f4["steal_pct"], f16["steal_pct"]]
    bw_ok = min(bw) >= 0.9 * max(bw)
    steal_ok = max(steals) <= 1.0
    return {
        "rows": f4["rows"],
        "local4_sec": f4["sec"], "local16_sec": f16["sec"],
        "alu4_sec": a4["sec"], "alu16_sec": a16["sec"],
        "raw_efficiency": round(raw, 3),
        "alu_ceiling": round(alu_eff, 3),
        "normalized_efficiency": round(raw / alu_eff, 3),
        "steal_pct": [round(s, 2) for s in steals],
        "bandwidth_gbs": [round(b, 2) for b in bw],
        "bw_stable_10pct": bw_ok,
        "steal_le_1pct": steal_ok,
        "certified": bw_ok and steal_ok,
    }


def main() -> None:
    attempts = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    os.environ["SPARK_GRAFT_BENCH_STEAL_MAX"] = "1.0"
    path = ensure_pages("/root/testdata/sf0.1", 4000)
    sessions = []
    chosen = None
    for i in range(attempts):
        s = one_session(path, runs)
        s["attempt"] = i + 1
        sessions.append(s)
        print(json.dumps(s))
        if s["certified"]:
            chosen = s
            break
        time.sleep(45)
    if chosen is None:
        # no fully-quiet window: take the attempt with the least evidence
        # of interference (lowest max steal, then most stable bandwidth)
        chosen = min(
            sessions,
            key=lambda s: (max(s["steal_pct"]),
                           -min(s["bandwidth_gbs"]) / max(s["bandwidth_gbs"])),
        )
    verdict = (
        "PASS raw >= 0.8"
        if chosen["raw_efficiency"] >= 0.8
        else (
            "hardware-bound: certified-quiet window, raw "
            f"{chosen['raw_efficiency']} vs ALU ceiling "
            f"{chosen['alu_ceiling']} -> normalized "
            f"{chosen['normalized_efficiency']} is the official reading"
            if chosen["certified"]
            else "UNCERTIFIED: no quiet window found in "
            f"{len(sessions)} attempts"
        )
    )
    stamp = datetime.datetime.now(
        datetime.timezone.utc).isoformat(timespec="seconds")
    block = (
        f"\n## r6 (4,16) certification — {stamp}\n\n"
        "Gates: steal <= 1.0% on every kept run AND STREAM-add bandwidth "
        "probe within 10% of session best at all five stage boundaries "
        "(alu4/alu16/flagship4/flagship16 interleaved with probes).\n\n"
        "```json\n" + json.dumps({"sessions": sessions,
                                  "certified_session": chosen,
                                  "verdict": verdict}, indent=1)
        + "\n```\n"
    )
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(block)
    print(json.dumps({"verdict": verdict, "chosen": chosen}))


if __name__ == "__main__":
    main()
