"""NetCDF-4/HDF5 chunk-grain ingest throughput at scale (VERDICT r4 #7).

Generates a many-chunk deflate+shuffle HDF5 file (default 8192² int32 =
256 MiB raw in 1024 chunks of 256²; SPARK_GRAFT_NC4_SIDE scales it up —
32768 → 4 GiB / 16k chunks), then measures:

  - driver header+index parse seconds (the mmap-lazy metadata read)
  - distributed chunk→fragment→tile ingest wall seconds (noop sink)
  - raw MB/s and chunks/s, the chunk-task parallelism, and the
    fragment-assembly shuffle partition count
  - the physical plan (chunk-count parallelism evidence), printed with
    SPARK_GRAFT_NC4_PLAN=1

Appends nothing; prints one JSON line for BENCH/BASELINE.md's nc4 note.
Run exclusively (any concurrent Spark job pollutes the number).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    side = int(os.environ.get("SPARK_GRAFT_NC4_SIDE", "8192"))
    chunk = 256
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    path = os.environ.get("SPARK_GRAFT_NC4_PATH", "/tmp/bench_nc4_big.h5")

    from tests.h5build import build_big_nc4

    t0 = time.perf_counter()
    if not os.path.exists(path) or os.environ.get("SPARK_GRAFT_NC4_REBUILD"):
        nchunks = build_big_nc4(path, side=side, chunk=chunk)
    else:
        nchunks = ((side + chunk - 1) // chunk) ** 2
    gen_sec = time.perf_counter() - t0

    from trefoil_spark.session import get_spark
    from trefoil_spark.sources.hdf5 import NC4File, ingest_netcdf4

    spark = get_spark(
        app_name="bench_nc4_ingest",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # driver-side metadata cost alone (header + chunk B-tree walk)
    t0 = time.perf_counter()
    nc = NC4File(path)
    n_idx = len(nc.h5.datasets["data"].chunk_map())
    meta_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    tiles, spec = ingest_netcdf4(spark, path, "data")
    plan_sec = time.perf_counter() - t0
    if os.environ.get("SPARK_GRAFT_NC4_PLAN"):
        tiles.explain("formatted")

    t0 = time.perf_counter()
    tiles.write.format("noop").mode("overwrite").save()
    ingest_sec = time.perf_counter() - t0

    raw_mb = side * side * 4 / 1e6
    out = {
        "metric": "nc4 chunk-grain ingest",
        "side": side,
        "chunks": nchunks,
        "chunks_indexed": n_idx,
        "raw_mb": round(raw_mb, 1),
        "file_mb": round(os.path.getsize(path) / 1e6, 1),
        "gen_sec": round(gen_sec, 2),
        "driver_meta_sec": round(meta_sec, 3),
        "plan_sec": round(plan_sec, 3),
        "ingest_sec": round(ingest_sec, 2),
        "mb_per_sec": round(raw_mb / ingest_sec, 1),
        "chunks_per_sec": round(nchunks / ingest_sec, 1),
        "cpus": int(cpus),
        "tiles": spec.ntiles_y * spec.ntiles_x,
        "load_1m": round(os.getloadavg()[0], 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
