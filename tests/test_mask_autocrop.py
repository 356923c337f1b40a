"""Mask operator (P9/J5) + data-window autocrop (P10)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from trefoil_spark.grid.bbox import BBox
from trefoil_spark.raster.autocrop import autocrop, data_window_df
from trefoil_spark.raster.gridspec import GridSpec
from trefoil_spark.raster.mask import (
    apply_mask,
    border_mask_tiles,
    mask_rule,
    synthetic_mask_tiles,
)
from trefoil_spark.raster.synth import block_values, synthetic_tiles

SPEC = GridSpec.from_bbox(BBox((-125.0, 32.0, -113.0, 38.0), "EPSG:4326"), 512, 256)


def _blk(row):
    return np.frombuffer(row["block"], dtype=np.float32).reshape(row["h"], row["w"])


def test_apply_mask_or_semantics(spark):
    """Masked pixels → NaN; data nodata stays nodata (OR, reference
    render_netcdf.py:306-322); unmasked pixels bit-identical."""
    tiles = synthetic_tiles(spark, SPEC)
    masked = apply_mask(tiles, synthetic_mask_tiles(spark, SPEC))
    rows = {(r["ty"], r["tx"]): r for r in masked.collect()}
    for (ty, tx), row in rows.items():
        want = block_values(SPEC, 0, ty, tx).copy()
        h, w = want.shape
        ys = ty * SPEC.tile + np.arange(h, dtype=np.int64)[:, None]
        xs = tx * SPEC.tile + np.arange(w, dtype=np.int64)[None, :]
        want[np.broadcast_to(mask_rule(ys, xs), want.shape)] = np.nan
        got = _blk(row)
        assert np.array_equal(got, want, equal_nan=True)


def test_apply_mask_missing_tile_passthrough(spark):
    """Tiles with no mask row pass through byte-identical (left join)."""
    tiles = synthetic_tiles(spark, SPEC)
    partial_mask = synthetic_mask_tiles(spark, SPEC).filter(F.col("tx") == 0)
    out = {(r["ty"], r["tx"]): r["block"] for r in apply_mask(tiles, partial_mask).collect()}
    orig = {(r["ty"], r["tx"]): r["block"] for r in tiles.collect()}
    untouched = [(k, v) for k, v in out.items() if k[1] != 0]
    assert untouched and all(orig[k] == v for k, v in untouched)
    assert all(out[k] != orig[k] for k in out if k[1] == 0)


def test_data_window_and_autocrop(spark):
    top, bottom, left, right = 7, 3, 5, 11
    bm = border_mask_tiles(spark, SPEC, top, bottom, left, right)
    tiles = apply_mask(synthetic_tiles(spark, SPEC), bm)

    win = data_window_df(tiles, SPEC).collect()[0]
    # the interior still has valid pixels right at the margins (the
    # scatter-mask rule leaves most pixels valid), so bounds are exact
    assert (win["ymin"], win["xmin"]) == (top, left)
    assert win["ymax"] == SPEC.height - bottom - 1
    assert win["xmax"] == SPEC.width - right - 1

    cropped, new_spec, window = autocrop(tiles, SPEC)
    assert (new_spec.height, new_spec.width) == (
        SPEC.height - top - bottom, SPEC.width - left - right
    )
    assert new_spec.x0 == SPEC.x0 + left * SPEC.dx
    assert new_spec.y0 == SPEC.y0 - top * SPEC.dy

    # stitched crop == numpy crop of the stitched original
    full = np.full((SPEC.height, SPEC.width), np.nan, dtype=np.float32)
    for r in synthetic_tiles(spark, SPEC).collect():
        oy, ox = r["ty"] * SPEC.tile, r["tx"] * SPEC.tile
        full[oy : oy + r["h"], ox : ox + r["w"]] = _blk(r)
    want = full[top : SPEC.height - bottom, left : SPEC.width - right]

    # cropped tiles live on new_spec's OWN lattice: a consumer computing
    # a tile's offset as ty*tile against new_spec must reassemble the
    # exact crop (ADVICE r2: the old re-keying displaced unaligned tiles)
    got = np.full(want.shape, np.nan, dtype=np.float32)
    seen = set()
    for r in cropped.collect():
        key = (r["ty"], r["tx"])
        assert key not in seen, f"duplicate tile {key} on the new lattice"
        seen.add(key)
        assert (r["h"], r["w"]) == new_spec.tile_shape(r["ty"], r["tx"])
        oy, ox = r["ty"] * new_spec.tile, r["tx"] * new_spec.tile
        got[oy : oy + r["h"], ox : ox + r["w"]] = _blk(r)
    assert np.array_equal(got, want, equal_nan=True)


def test_autocrop_aligned_window_fast_path(spark):
    """Tile-aligned windows take the shuffle-free path and still land on
    the new lattice."""
    from trefoil_spark.raster.autocrop import _retile

    tiles = synthetic_tiles(spark, SPEC)
    tile = SPEC.tile
    y0, y1, x0, x1 = 0, SPEC.height, tile, SPEC.width  # x-aligned crop
    new_spec = GridSpec(
        crs=SPEC.crs, x0=SPEC.x0 + x0 * SPEC.dx, y0=SPEC.y0,
        dx=SPEC.dx, dy=SPEC.dy, width=x1 - x0, height=y1 - y0, tile=tile,
    )
    out = _retile(tiles, tiles, y0, y1, x0, x1, new_spec)
    # shuffle-free: no grouped-paste (FlatMapGroupsInPandas) in the plan
    assert "FlatMapGroupsInPandas" not in out._jdf.queryExecution().toString()
    rows = {(r["ty"], r["tx"]): r for r in out.collect()}
    assert set(rows) == {(0, 0)}
    want = block_values(SPEC, 0, 0, 1)
    assert np.array_equal(_blk(rows[(0, 0)]), want, equal_nan=True)


def test_autocrop_no_data_raises(spark):
    bm = border_mask_tiles(spark, SPEC, SPEC.height, 0, 0, 0)  # mask all
    tiles = apply_mask(synthetic_tiles(spark, SPEC), bm)
    with pytest.raises(ValueError, match="no valid data"):
        autocrop(tiles, SPEC)
