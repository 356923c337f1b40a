"""R4 vectorize + R1 warp tests: exact round-trips."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from trefoil_spark.geometry.pip import points_in_rings
from trefoil_spark.grid.bbox import BBox
from trefoil_spark.raster.gridspec import GridSpec
from trefoil_spark.raster.vectorize import (
    boundary_rings,
    label_components,
    vectorize_block,
)

SPEC = GridSpec.from_bbox(BBox((0.0, 0.0, 16.0, 16.0), "EPSG:4326"), 16, 16, tile=16)


def _roundtrip(mask: np.ndarray):
    """PIP of pixel centers over traced rings must equal the mask."""
    rings = boundary_rings(mask)
    h, w = mask.shape
    yy, xx = np.mgrid[0:h, 0:w]
    px = xx.ravel() + 0.5
    py = yy.ravel() + 0.5
    got = points_in_rings(px, py, rings).reshape(h, w)
    assert np.array_equal(got, mask), f"\n{mask.astype(int)}\nvs\n{got.astype(int)}"


def test_label_components():
    m = np.zeros((6, 6), dtype=bool)
    m[0:2, 0:2] = True
    m[4:6, 4:6] = True
    labels = label_components(m)
    assert len(np.unique(labels[labels > 0])) == 2
    # diagonal touch = separate components (4-connectivity)
    m2 = np.eye(4, dtype=bool)
    assert len(np.unique(label_components(m2)[label_components(m2) > 0])) == 4


def test_boundary_rings_simple():
    m = np.zeros((5, 5), dtype=bool)
    m[1:4, 1:4] = True
    _roundtrip(m)
    rings = boundary_rings(m)
    assert len(rings) == 1 and len(rings[0]) == 4  # square


def test_boundary_rings_hole():
    m = np.zeros((7, 7), dtype=bool)
    m[1:6, 1:6] = True
    m[3, 3] = False  # hole
    _roundtrip(m)
    assert len(boundary_rings(m)) == 2  # outer + hole


def test_boundary_rings_diagonal_touch():
    # same component touching itself diagonally via a connecting bridge
    m = np.zeros((5, 5), dtype=bool)
    m[0, 0] = m[1, 1] = True
    m[0, 1] = False
    m[1, 0] = False
    # two separate 4-components here; each traces independently
    _roundtrip(m)
    # L-shape with diagonal self-touch (one component)
    m2 = np.array(
        [
            [1, 1, 0],
            [0, 1, 0],
            [1, 1, 0],
        ],
        dtype=bool,
    )
    _roundtrip(m2)
    # checkerboard stress
    m3 = (np.indices((6, 6)).sum(axis=0) % 2).astype(bool)
    _roundtrip(m3)


def test_boundary_rings_random_masks():
    rng = np.random.default_rng(9)
    for _ in range(20):
        m = rng.random((12, 12)) > 0.5
        _roundtrip(m)


def test_vectorize_block_world_coords():
    classes = np.full((16, 16), 0xFFFF, dtype=np.int64)
    classes[2:6, 3:9] = 7
    out = vectorize_block(classes, SPEC, 0, 0)
    assert len(out) == 1
    value, lab, rings, count, border = out[0]
    assert value == 7 and count == 24
    ring = np.asarray(rings[0]).reshape(-1, 2)
    assert ring[:, 0].min() == 3.0 and ring[:, 0].max() == 9.0
    assert ring[:, 1].min() == 16.0 - 6.0 and ring[:, 1].max() == 16.0 - 2.0


def test_vectorize_tiles_and_merge(spark):
    """Rasterize zones → vectorize → merged global components cover the
    same pixel counts per class (exact round-trip at tile grain)."""
    from trefoil_spark.raster.rasterize import rasterize_zones
    from trefoil_spark.raster.vectorize import merge_components, vectorize_tiles
    from trefoil_spark.sources.zones import ZONE_LAYER

    spec = GridSpec.from_bbox(BBox((-125.0, 32.0, -113.0, 38.0), "EPSG:4326"), 512, 256)
    ztiles = rasterize_zones(spark, spec, ZONE_LAYER)
    vec = vectorize_tiles(ztiles, spec)
    merged = merge_components(vec)

    per_class = {
        r["class"]: r["n"]
        for r in merged.groupBy("class").agg(F.sum("pixel_count").alias("n")).collect()
    }
    # oracle: pixel counts straight from the rasterized blocks
    import pandas as pd

    blocks = ztiles.collect()
    want: dict[int, int] = {}
    for row in blocks:
        z = np.frombuffer(row["zone_block"], dtype=np.uint16)
        for v, c in zip(*np.unique(z[z != 0xFFFF], return_counts=True)):
            want[int(v)] = want.get(int(v), 0) + int(c)
    assert per_class == want

    # zones spanning multiple tiles collapse to one global component
    n_components = merged.select("class", "global_id").distinct().count()
    assert n_components == len(ZONE_LAYER)  # each zone is one connected region


def test_warp_identity_and_3857(spark):
    from trefoil_spark.raster.synth import block_values, synthetic_tiles
    from trefoil_spark.raster.warp import warp_tile_numpy, warp_tiles

    src_spec = GridSpec.from_bbox(
        BBox((-125.0, 32.0, -113.0, 38.0), "EPSG:4326"), 512, 256
    )
    # identity warp: same grid → same values
    src = block_values(src_spec, 0, 0, 0)
    out = warp_tile_numpy(
        np.nan_to_num(src, nan=-1), src_spec, src_spec, 0, 0
    )
    assert np.allclose(out, np.nan_to_num(src, nan=-1), equal_nan=True)

    # 4326 → 3857 distributed warp: value at a probe point matches the
    # source pixel containing the back-projected probe
    from trefoil_spark.grid import proj

    b3857 = src_spec.bbox.project("EPSG:3857")
    dst_spec = GridSpec.from_bbox(b3857, 512, 256)
    tiles = synthetic_tiles(spark, src_spec)
    warped = warp_tiles(spark, tiles, src_spec, dst_spec)
    rows = {(r["ty"], r["tx"]): r for r in warped.collect()}
    assert len(rows) == 2
    blk = np.frombuffer(rows[(0, 0)]["block"], dtype=np.float32).reshape(256, 256)

    # probe dst pixel (100, 77)
    dy, dx = 100, 77
    lat = dst_spec.y0 - (dy + 0.5) * dst_spec.dy
    lon = dst_spec.x0 + (dx + 0.5) * dst_spec.dx
    slon, slat = proj.transform("EPSG:3857", "EPSG:4326", lon, lat)
    six = int(np.floor((slon - src_spec.x0) / src_spec.dx))
    siy = int(np.floor((src_spec.y0 - slat) / src_spec.dy))
    src_full = block_values(src_spec, 0, 0, 0)  # tile 0,0 covers x<256
    if six < 256:
        want = src_full[siy, six]
        got = blk[dy, dx]
        assert (np.isnan(want) and np.isnan(got)) or got == want
