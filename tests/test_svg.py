"""SVG subset rasterizer (late r6): pixel-center sampling vs
independent point-in-shape oracles, fill rules, transforms, paint
order, path flattening, error contract."""

import numpy as np
import pytest

from trefoil_spark.functions.svg import decode_svg


def test_rect_exact_pixels():
    svg = (b'<svg xmlns="http://www.w3.org/2000/svg" width="8" height="6">'
           b'<rect x="2" y="1" width="3" height="2" fill="#ff0000"/></svg>')
    img = decode_svg(svg)
    assert img.shape == (6, 8, 4)
    want = np.zeros((6, 8), bool)
    want[1:3, 2:5] = True  # pixel centers strictly inside [2,5)x[1,3)
    assert np.array_equal(img[..., 3] > 0, want)
    assert (img[1, 2] == [255, 0, 0, 255]).all()


def test_circle_matches_analytic_oracle():
    svg = (b'<svg xmlns="http://www.w3.org/2000/svg" width="20" height="20">'
           b'<circle cx="10" cy="10" r="6" fill="blue"/></svg>')
    img = decode_svg(svg)
    ys, xs = np.mgrid[0:20, 0:20]
    # the rasterizer flattens the circle to a 64-gon; at r=6 the 64-gon
    # vs true-circle disagreement can only appear within its sagitta
    # (~0.03px) of the boundary, and no pixel center lands there
    dist = np.hypot(xs + 0.5 - 10, ys + 0.5 - 10)
    inside = img[..., 3] > 0
    assert (inside[dist < 5.9]).all()
    assert (~inside[dist > 6.1]).all()


def test_evenodd_donut_vs_nonzero():
    # two concentric same-direction squares: evenodd leaves a hole,
    # nonzero fills it
    body = (b'<path d="M2 2 L14 2 L14 14 L2 14 Z M6 6 L10 6 L10 10 L6 10 Z" '
            b'fill="black" fill-rule="%s"/>')
    for rule, hole_filled in ((b"evenodd", False), (b"nonzero", True)):
        svg = (b'<svg xmlns="http://www.w3.org/2000/svg" width="16" '
               b'height="16">' + body % rule + b"</svg>")
        img = decode_svg(svg)
        assert bool(img[8, 8, 3]) is hole_filled
        assert img[3, 3, 3] > 0  # ring body always filled


def test_paint_order_and_named_colors():
    svg = (b'<svg xmlns="http://www.w3.org/2000/svg" width="8" height="8">'
           b'<rect x="0" y="0" width="8" height="8" fill="navy"/>'
           b'<rect x="2" y="2" width="4" height="4" fill="orange"/></svg>')
    img = decode_svg(svg)
    assert (img[0, 0, :3] == [0, 0, 128]).all()
    assert (img[4, 4, :3] == [255, 165, 0]).all()


def test_group_transform_and_inherited_fill():
    svg = (b'<svg xmlns="http://www.w3.org/2000/svg" width="12" height="12">'
           b'<g fill="#00ff00" transform="translate(4,4) scale(2)">'
           b'<rect x="0" y="0" width="2" height="2"/></g></svg>')
    img = decode_svg(svg)
    want = np.zeros((12, 12), bool)
    want[4:8, 4:8] = True  # 2x2 rect scaled 2x, moved to (4,4)
    assert np.array_equal(img[..., 3] > 0, want)
    assert (img[5, 5, :3] == [0, 255, 0]).all()


def test_viewbox_scaling():
    svg = (b'<svg xmlns="http://www.w3.org/2000/svg" width="10" height="10" '
           b'viewBox="0 0 100 100">'
           b'<rect x="0" y="0" width="50" height="100" fill="red"/></svg>')
    img = decode_svg(svg)
    assert (img[:, :5, 3] > 0).all()
    assert (img[:, 5:, 3] == 0).all()


def test_bezier_triangle_flattening():
    # a quadratic curve whose control point pulls right: the filled
    # region must lie between the chord and the control hull
    svg = (b'<svg xmlns="http://www.w3.org/2000/svg" width="16" height="16">'
           b'<path d="M2 2 Q14 8 2 14 Z" fill="black"/></svg>')
    img = decode_svg(svg)
    inside = img[..., 3] > 0
    assert inside[8, 6]          # on the bulge side near the chord
    assert not inside[8, 14]     # beyond the curve (hull exterior)
    assert not inside[2, 12]     # top right corner: outside
    # symmetric about y=8: centers 0.5..7.5 mirror to 15.5..8.5
    assert np.array_equal(inside[:8], inside[8:][::-1])


def test_fill_opacity_composites():
    svg = (b'<svg xmlns="http://www.w3.org/2000/svg" width="4" height="4">'
           b'<rect x="0" y="0" width="4" height="4" fill="#ff0000"/>'
           b'<rect x="0" y="0" width="4" height="4" fill="#0000ff" '
           b'fill-opacity="0.5"/></svg>')
    img = decode_svg(svg)
    # 50% blue over opaque red: (128, 0, 127-128) with straight alpha
    assert abs(int(img[1, 1, 0]) - 128) <= 1
    assert abs(int(img[1, 1, 2]) - 128) <= 1
    assert img[1, 1, 3] == 255


def test_unknown_elements_ignored_arc_raises():
    ok = (b'<svg xmlns="http://www.w3.org/2000/svg" width="4" height="4">'
          b'<metadata>junk</metadata><text x="0" y="0">hi</text>'
          b'<rect x="0" y="0" width="4" height="4" fill="black"/></svg>')
    assert decode_svg(ok)[..., 3].all()
    arc = (b'<svg xmlns="http://www.w3.org/2000/svg" width="4" height="4">'
           b'<path d="M0 0 A2 2 0 0 1 4 4 Z" fill="black"/></svg>')
    with pytest.raises(ValueError, match="unsupported path command"):
        decode_svg(arc)
    with pytest.raises(ValueError, match="XML parse"):
        decode_svg(b"<svg>broken")
    with pytest.raises(ValueError, match="max_side"):
        decode_svg(b'<svg xmlns="http://www.w3.org/2000/svg" '
                   b'width="99999" height="4"/>')


def test_polygon_ray_cast_oracle():
    """Random star-ish polygons: every pixel verdict equals an
    independently written ray-casting oracle at pixel centers."""
    rng = np.random.default_rng(9)
    for _ in range(5):
        n = int(rng.integers(3, 9))
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        rad = rng.uniform(3, 9, n)
        pts = [(10 + r * np.cos(a), 10 + r * np.sin(a))
               for r, a in zip(rad, ang)]
        pstr = " ".join(f"{x:.4f},{y:.4f}" for x, y in pts)
        svg = (f'<svg xmlns="http://www.w3.org/2000/svg" width="20" '
               f'height="20"><polygon points="{pstr}" fill="black"/>'
               f"</svg>").encode()
        img = decode_svg(svg)

        def inside(px, py):
            c = False
            for k in range(n):
                x0, y0 = pts[k]
                x1, y1 = pts[(k + 1) % n]
                if (y0 <= py) != (y1 <= py):
                    t = (py - y0) / (y1 - y0)
                    if px > x0 + t * (x1 - x0):
                        c = not c
            return c

        for py in range(20):
            for px in range(20):
                assert bool(img[py, px, 3]) == inside(px + 0.5, py + 0.5), (
                    pts, px, py
                )


def test_svg_multimodal_dispatch(spark):
    from pyspark.sql import functions as F

    from trefoil_spark.operators.multimodal import (
        decode_image_features,
        sniff_format,
    )

    svg = (b'<?xml version="1.0"?>\n'
           b'<svg xmlns="http://www.w3.org/2000/svg" width="6" height="4">'
           b'<rect x="0" y="0" width="6" height="4" fill="#102030"/></svg>')
    assert sniff_format(svg) == "svg"
    docs = spark.createDataFrame(
        [(1, bytearray(svg))], "doc_id bigint, media binary"
    )
    row = decode_image_features(docs).collect()[0]
    assert row["fmt"] == "svg"
    assert (row["width"], row["height"]) == (6, 4)
    assert row["sum_r"] == 0x10 * 24
    assert row["sum_g"] == 0x20 * 24
    assert row["sum_b"] == 0x30 * 24
