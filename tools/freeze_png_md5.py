"""Regenerate the png_stability frozen-md5 fixture.

Computes each synthetic tile's rendered PNG md5 with the SPARK-FREE
numpy render path (block_values → renderer.render_png → hashlib), so the
fixture is independent of the engine under test; prints the python
literal to paste into __spark_entry__._PNG_MD5_FIXTURE.

Run: python tools/freeze_png_md5.py
"""

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trefoil_spark.functions.color import Color  # noqa: E402
from trefoil_spark.raster.render import StretchedRenderer  # noqa: E402
from trefoil_spark.raster.synth import block_values  # noqa: E402


def fixture():
    import __spark_entry__ as entry

    renderer = StretchedRenderer(
        [(0.0, Color(0, 0, 0)), (999.0, Color(255, 255, 255))],
        colorspace="rgb",
        palette_size=90,
    )
    spec = entry.SPEC
    rows = []
    for ty in range(spec.ntiles_y):
        for tx in range(spec.ntiles_x):
            blk = block_values(spec, 0, ty, tx).astype("float64")
            png = renderer.render_png(blk)
            rows.append((ty, tx, hashlib.md5(png).hexdigest()))
    return rows


if __name__ == "__main__":
    print("_PNG_MD5_FIXTURE = (")
    for r in fixture():
        print(f"    {r!r},")
    print(")")
