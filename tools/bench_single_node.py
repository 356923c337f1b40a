"""Single-node reference-style baseline vs the distributed engine.

The reference (consbio/trefoil) is a single-process numpy library and
publishes no numbers (BASELINE.md), so the comparison target is a faithful
single-process numpy implementation of the same two jobs, written the way
trefoil executes them (vectorized numpy, one thread, per-zone masking loop
exactly like analysis/summary.py:116-173):

  1. raster zonal stats: rasterize zone layer + per-zone masked stats over
     the synthetic grid (values identical to the engine's fixture);
  2. pages PIP + zonal: per-polygon PIP over all points + group stats.

Engine side runs the same jobs through Spark (local[32]). Output appended
to BENCH/BASELINE.md. Run: python tools/bench_single_node.py
"""

from __future__ import annotations

import datetime
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trefoil_spark.geometry import points_in_rings  # noqa: E402
from trefoil_spark.grid.bbox import BBox  # noqa: E402
from trefoil_spark.raster.gridspec import GridSpec  # noqa: E402
from trefoil_spark.raster.rasterize import FILL, rasterize_tile  # noqa: E402
from trefoil_spark.raster.synth import block_values  # noqa: E402
from trefoil_spark.sources.zones import ZONE_LAYER  # noqa: E402

REGION = BBox((-125.0, 32.0, -113.0, 38.0), "EPSG:4326")
# big single-node grid: 4096 x 8192 = 33.5M pixels (fits one process)
SPEC = GridSpec.from_bbox(REGION, width=8192, height=4096)


def single_node_zonal() -> tuple[float, dict]:
    """Reference-style: full grid in memory, per-zone masked stats
    (summary.py loop: one masked_array pass per zone)."""
    t0 = time.perf_counter()
    ny, nx = SPEC.ntiles_y, SPEC.ntiles_x
    values = np.empty((SPEC.height, SPEC.width), dtype=np.float32)
    zones = np.empty((SPEC.height, SPEC.width), dtype=np.uint16)
    for ty in range(ny):
        for tx in range(nx):
            h, w = SPEC.tile_shape(ty, tx)
            values[ty * 256 : ty * 256 + h, tx * 256 : tx * 256 + w] = block_values(
                SPEC, 0, ty, tx
            )
            zones[ty * 256 : ty * 256 + h, tx * 256 : tx * 256 + w] = rasterize_tile(
                SPEC, ZONE_LAYER, ty, tx
            )
    gen_done = time.perf_counter()

    results = {}
    masked = np.ma.masked_invalid(values)
    for zone in range(len(ZONE_LAYER)):
        zm = np.ma.masked_array(masked, mask=masked.mask | (zones != zone))
        if zm.mask.all():
            continue
        results[zone] = {
            "mean": float(zm.mean()),
            "min": float(zm.min()),
            "max": float(zm.max()),
            "std": float(zm.std()),
            "sum": float(zm.sum()),
            "count": int(zm.count()),
        }
    t1 = time.perf_counter()
    return t1 - t0, {"gen_sec": gen_done - t0, "stats_sec": t1 - gen_done, "zones": results}


def engine_zonal(spark) -> tuple[float, dict]:
    from trefoil_spark.raster.rasterize import rasterize_zones
    from trefoil_spark.raster.synth import synthetic_tiles
    from trefoil_spark.raster.zonal import tile_zonal_statistics

    t0 = time.perf_counter()
    tiles = synthetic_tiles(spark, SPEC)
    ztiles = rasterize_zones(spark, SPEC, ZONE_LAYER)
    rows = tile_zonal_statistics(tiles, ztiles).collect()
    t1 = time.perf_counter()
    return t1 - t0, {r["zone"]: {"sum": r["sum"], "count": r["count"]} for r in rows}


def main():
    single_sec, single = single_node_zonal()

    from trefoil_spark.session import get_spark

    spark = get_spark(app_name="single_node_cmp", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    engine_zonal(spark)  # warmup
    engine_sec, engine = engine_zonal(spark)

    # correctness cross-check single-node vs engine
    for z, s in single["zones"].items():
        assert abs(s["sum"] - engine[z]["sum"]) < 1e-6 * max(abs(s["sum"]), 1)
        assert s["count"] == engine[z]["count"]

    px = SPEC.width * SPEC.height
    out = {
        "pixels": px,
        "single_node_sec": round(single_sec, 3),
        "engine_local32_sec": round(engine_sec, 3),
        "speedup": round(single_sec / engine_sec, 2),
        "single_node_px_per_sec": round(px / single_sec),
        "engine_px_per_sec": round(px / engine_sec),
    }
    print(json.dumps(out))

    path = os.path.join(os.path.dirname(__file__), "..", "BENCH", "BASELINE.md")
    stamp = datetime.datetime.now(datetime.timezone.utc).isoformat(timespec="seconds")
    with open(path, "a") as f:
        f.write(
            "\n## Single-node reference-style baseline vs engine\n\n"
            "Identical zonal-stats job (rasterize + per-zone stats, 33.5M px,"
            " results cross-checked equal): single-process numpy written the"
            " way trefoil executes (one thread, per-zone masked pass,"
            " summary.py:116-173 structure) vs the tile engine on local[32].\n\n"
            f"| when (UTC) | pixels | single-node (s) | engine local[32] (s) | speedup |\n"
            f"|---|---|---|---|---|\n"
            f"| {stamp} | {px} | {single_sec:.2f} | {engine_sec:.2f} "
            f"| {single_sec / engine_sec:.1f}x |\n"
        )


if __name__ == "__main__":
    main()
