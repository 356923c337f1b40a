"""Partial edge tiles: grids whose dims are NOT multiples of the tile size
must flow through generation, rasterize, zonal, window ops, and vectorize
without padding artifacts."""

import duckdb
import numpy as np
import pandas as pd

from trefoil_spark.geometry import pip_sql_expr
from trefoil_spark.grid.bbox import BBox
from trefoil_spark.raster.gridspec import GridSpec
from trefoil_spark.raster.rasterize import rasterize_zones
from trefoil_spark.raster.synth import synthetic_tiles, value_sql
from trefoil_spark.raster.zonal import tile_zonal_statistics
from trefoil_spark.sources.zones import ZONE_LAYER

# 300 x 500: 2x2 tile grid with ragged bottom/right edges
SPEC = GridSpec.from_bbox(BBox((-125.0, 32.0, -113.0, 38.0), "EPSG:4326"), 500, 300)


def test_partial_tile_shapes(spark):
    tiles = synthetic_tiles(spark, SPEC).collect()
    shapes = {(r["ty"], r["tx"]): (r["h"], r["w"]) for r in tiles}
    assert shapes[(0, 0)] == (256, 256)
    assert shapes[(0, 1)] == (256, 244)
    assert shapes[(1, 0)] == (44, 256)
    assert shapes[(1, 1)] == (44, 244)
    for r in tiles:
        assert len(bytes(r["block"])) == r["h"] * r["w"] * 4


def test_partial_tile_zonal_matches_oracle(spark):
    tiles = synthetic_tiles(spark, SPEC)
    ztiles = rasterize_zones(spark, SPEC, ZONE_LAYER)
    got = tile_zonal_statistics(tiles, ztiles).orderBy("zone").toPandas()

    cases = " ".join(
        f"WHEN {pip_sql_expr('lon', 'lat', ZONE_LAYER[fid])} THEN {fid}"
        for fid in reversed(range(len(ZONE_LAYER)))
    )
    want = duckdb.sql(
        f"""
        WITH px AS (
            SELECT CAST(i // {SPEC.width} AS BIGINT) AS y,
                   CAST(i % {SPEC.width} AS BIGINT) AS x
            FROM (SELECT UNNEST(range({SPEC.width * SPEC.height})) AS i)
        ), geo AS (
            SELECT y, x, {SPEC.lon_sql('x')} AS lon, {SPEC.lat_sql('y')} AS lat,
                   {value_sql('y', 'x')} AS v FROM px
        ), z AS (SELECT CASE {cases} END AS zone, v FROM geo)
        SELECT zone,
               SUM(v) / COUNT(v) AS mean, MIN(v) AS min, MAX(v) AS max,
               SQRT(SUM(v*v)/COUNT(v) - (SUM(v)/COUNT(v))*(SUM(v)/COUNT(v))) AS std,
               SUM(v) AS sum, COUNT(v) AS count
        FROM z WHERE zone IS NOT NULL AND v IS NOT NULL
        GROUP BY zone ORDER BY zone
        """
    ).df()
    pd.testing.assert_frame_equal(
        got[["zone", "mean", "min", "max", "std", "sum", "count"]],
        want,
        check_dtype=False,
    )


def test_partial_tile_vectorize_coverage(spark):
    from pyspark.sql import functions as F

    from trefoil_spark.raster.vectorize import merge_components, vectorize_tiles

    ztiles = rasterize_zones(spark, SPEC, ZONE_LAYER)
    merged = merge_components(vectorize_tiles(ztiles, SPEC))
    per_class = {
        r["class"]: r["n"]
        for r in merged.groupBy("class").agg(F.sum("pixel_count").alias("n")).collect()
    }
    want: dict[int, int] = {}
    for row in ztiles.collect():
        z = np.frombuffer(row["zone_block"], dtype=np.uint16)
        for v, c in zip(*np.unique(z[z != 0xFFFF], return_counts=True)):
            want[int(v)] = want.get(int(v), 0) + int(c)
    assert per_class == want
