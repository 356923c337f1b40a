"""SVG subset rasterizer (late r6). SVG is a top-5 crawl image format;
a training pipeline needs thumbnails of it, not a browser. This is a
deterministic, spec-subset renderer over the public SVG 1.1 shape
model:

  supported: svg (width/height/viewBox), g (fill + transform
  inheritance), rect, circle, ellipse, line, polyline, polygon, path
  (M/m L/l H/h V/v C/c Q/q Z/z, multiple subpaths), solid paint
  (#rgb, #rrggbb, rgb(r,g,b), a small named-color table, 'none'),
  fill-rule nonzero/evenodd, fill-opacity, transform translate/scale.

  semantics: curves flatten to 16 line segments; filling samples pixel
  CENTERS (x+0.5, y+0.5) with the winding/crossing rule — no
  anti-aliasing, so output is a pure function of the document (the
  property tests point-sample an independent geometry oracle).
  Unsupported elements/presentation attributes are IGNORED (crawl SVGs
  carry arbitrary metadata); unsupported PATH COMMANDS (A/S/T) raise —
  silently mis-tracing an arc would paint wrong pixels.

  strokes are not painted (fill-only subset, documented).

Output: (h, w, 4) uint8 RGBA over a transparent canvas, elements
painted in document order.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

import numpy as np

__all__ = ["decode_svg", "rasterize_shapes"]

_COLORS = {
    "black": (0, 0, 0), "white": (255, 255, 255), "red": (255, 0, 0),
    "green": (0, 128, 0), "lime": (0, 255, 0), "blue": (0, 0, 255),
    "yellow": (255, 255, 0), "cyan": (0, 255, 255), "aqua": (0, 255, 255),
    "magenta": (255, 0, 255), "fuchsia": (255, 0, 255),
    "gray": (128, 128, 128), "grey": (128, 128, 128),
    "silver": (192, 192, 192), "maroon": (128, 0, 0),
    "olive": (128, 128, 0), "navy": (0, 0, 128), "purple": (128, 0, 128),
    "teal": (0, 128, 128), "orange": (255, 165, 0),
}

_BEZIER_STEPS = 16


def _parse_color(s: str):
    s = (s or "").strip()
    if not s or s == "none":
        return None
    if s.startswith("#"):
        h = s[1:]
        if len(h) == 3:
            return tuple(int(c * 2, 16) for c in h)
        if len(h) == 6:
            return tuple(int(h[i:i + 2], 16) for i in (0, 2, 4))
        raise ValueError(f"SVG: bad hex color {s!r}")
    m = re.match(r"rgb\(\s*(\d+)\s*,\s*(\d+)\s*,\s*(\d+)\s*\)$", s)
    if m:
        return tuple(min(255, int(g)) for g in m.groups())
    if s.lower() in _COLORS:
        return _COLORS[s.lower()]
    return None  # unknown paint: skip the element (crawl tolerance)


def _num(s, default=0.0):
    if s is None:
        return default
    m = re.match(r"\s*(-?\d*\.?\d+(?:[eE][-+]?\d+)?)", str(s))
    return float(m.group(1)) if m else default


_PATH_TOKEN = re.compile(
    r"([MmLlHhVvCcQqZzAaSsTt])|(-?\d*\.?\d+(?:[eE][-+]?\d+)?)"
)


def _flatten_path(d: str) -> list:
    """Path data → list of closed rings (each a list of (x, y)).  Open
    subpaths are implicitly closed for filling (SVG fill semantics)."""
    toks = []
    for cmd, num in _PATH_TOKEN.findall(d):
        toks.append(cmd if cmd else float(num))
    rings: list = []
    cur: list = []
    x = y = sx = sy = 0.0
    i = 0
    cmd = None

    def nums(k):
        nonlocal i
        vals = toks[i:i + k]
        if len(vals) != k or any(isinstance(v, str) for v in vals):
            raise ValueError("SVG: short path parameter list")
        i += k
        return vals

    def bez(p0, pts):
        out = []
        for t_i in range(1, _BEZIER_STEPS + 1):
            t = t_i / _BEZIER_STEPS
            if len(pts) == 3:  # cubic
                (x1, y1), (x2, y2), (x3, y3) = pts
                mt = 1 - t
                bx = (mt ** 3 * p0[0] + 3 * mt ** 2 * t * x1
                      + 3 * mt * t ** 2 * x2 + t ** 3 * x3)
                by = (mt ** 3 * p0[1] + 3 * mt ** 2 * t * y1
                      + 3 * mt * t ** 2 * y2 + t ** 3 * y3)
            else:  # quadratic
                (x1, y1), (x2, y2) = pts
                mt = 1 - t
                bx = mt ** 2 * p0[0] + 2 * mt * t * x1 + t ** 2 * x2
                by = mt ** 2 * p0[1] + 2 * mt * t * y1 + t ** 2 * y2
            out.append((bx, by))
        return out

    while i < len(toks):
        t = toks[i]
        if isinstance(t, str):
            cmd = t
            i += 1
            if cmd in "Zz":
                if cur:
                    rings.append(cur)
                    cur = []
                x, y = sx, sy
                continue
        if cmd is None:
            raise ValueError("SVG: path data before any command")
        if cmd in "AaSsTt":
            raise ValueError(f"SVG: unsupported path command {cmd!r}")
        rel = cmd.islower()
        c = cmd.upper()
        if c == "M":
            px, py = nums(2)
            x, y = (x + px, y + py) if rel else (px, py)
            if cur:
                rings.append(cur)
            cur = [(x, y)]
            sx, sy = x, y
            cmd = "l" if rel else "L"  # subsequent pairs are lineto
        elif c == "L":
            px, py = nums(2)
            x, y = (x + px, y + py) if rel else (px, py)
            cur.append((x, y))
        elif c == "H":
            (px,) = nums(1)
            x = x + px if rel else px
            cur.append((x, y))
        elif c == "V":
            (py,) = nums(1)
            y = y + py if rel else py
            cur.append((x, y))
        elif c == "C":
            x1, y1, x2, y2, x3, y3 = nums(6)
            if rel:
                x1 += x; y1 += y; x2 += x; y2 += y; x3 += x; y3 += y
            cur.extend(bez((x, y), [(x1, y1), (x2, y2), (x3, y3)]))
            x, y = x3, y3
        elif c == "Q":
            x1, y1, x2, y2 = nums(4)
            if rel:
                x1 += x; y1 += y; x2 += x; y2 += y
            cur.extend(bez((x, y), [(x1, y1), (x2, y2)]))
            x, y = x2, y2
    if cur:
        rings.append(cur)
    return [r for r in rings if len(r) >= 3]


def _ellipse_ring(cx, cy, rx, ry, steps=64):
    return [(cx + rx * np.cos(2 * np.pi * k / steps),
             cy + ry * np.sin(2 * np.pi * k / steps))
            for k in range(steps)]


def _shape_rings(el) -> list:
    tag = el.tag.rsplit("}", 1)[-1]
    a = el.get
    if tag == "rect":
        x, y = _num(a("x")), _num(a("y"))
        w, h = _num(a("width")), _num(a("height"))
        if w <= 0 or h <= 0:
            return []
        return [[(x, y), (x + w, y), (x + w, y + h), (x, y + h)]]
    if tag == "circle":
        r = _num(a("r"))
        return [_ellipse_ring(_num(a("cx")), _num(a("cy")), r, r)] if r > 0 else []
    if tag == "ellipse":
        rx, ry = _num(a("rx")), _num(a("ry"))
        if rx <= 0 or ry <= 0:
            return []
        return [_ellipse_ring(_num(a("cx")), _num(a("cy")), rx, ry)]
    if tag in ("polygon", "polyline"):
        nums = [float(v) for v in re.findall(
            r"-?\d*\.?\d+(?:[eE][-+]?\d+)?", a("points") or "")]
        pts = list(zip(nums[0::2], nums[1::2]))
        return [pts] if len(pts) >= 3 else []
    if tag == "path":
        return _flatten_path(a("d") or "")
    return []  # line/text/unknown: not filled


def _parse_transform(s: str):
    """translate/scale subset → (sx, sy, tx, ty) applied as
    x' = sx*x + tx."""
    sx = sy = 1.0
    tx = ty = 0.0
    for name, args in re.findall(r"(\w+)\s*\(([^)]*)\)", s or ""):
        vals = [float(v) for v in re.findall(
            r"-?\d*\.?\d+(?:[eE][-+]?\d+)?", args)]
        if name == "translate":
            dx = vals[0] if vals else 0.0
            dy = vals[1] if len(vals) > 1 else 0.0
            tx += sx * dx
            ty += sy * dy
        elif name == "scale":
            fx = vals[0] if vals else 1.0
            fy = vals[1] if len(vals) > 1 else fx
            sx *= fx
            sy *= fy
        # other transforms (rotate/matrix/skew) ignored: subset
    return sx, sy, tx, ty


def _compose(outer, inner):
    osx, osy, otx, oty = outer
    isx, isy, itx, ity = inner
    return osx * isx, osy * isy, osx * itx + otx, osy * ity + oty


def rasterize_shapes(shapes: list, w: int, h: int) -> np.ndarray:
    """[(rings, rgb, alpha, fill_rule)] in paint order → (h, w, 4)
    RGBA. Scanline fill at pixel centers; winding for 'nonzero',
    crossing parity for 'evenodd'. Vectorized per shape per scanline
    over edge arrays."""
    img = np.zeros((h, w, 4), np.uint8)
    xs_c = np.arange(w) + 0.5
    for rings, rgb, alpha, rule in shapes:
        edges = []
        for ring in rings:
            n = len(ring)
            for k in range(n):
                x0, y0 = ring[k]
                x1, y1 = ring[(k + 1) % n]
                if y0 != y1:
                    edges.append((x0, y0, x1, y1))
        if not edges:
            continue
        e = np.array(edges, dtype=np.float64)
        ex0, ey0, ex1, ey1 = e[:, 0], e[:, 1], e[:, 2], e[:, 3]
        ymin = max(0, int(np.floor(min(ey0.min(), ey1.min()) - 0.5)))
        ymax = min(h - 1, int(np.ceil(max(ey0.max(), ey1.max()))))
        for py in range(ymin, ymax + 1):
            yc = py + 0.5
            # half-open rule [min, max): each vertex counted once
            active = ((ey0 <= yc) & (ey1 > yc)) | ((ey1 <= yc) & (ey0 > yc))
            if not active.any():
                continue
            ax0, ay0 = ex0[active], ey0[active]
            ax1, ay1 = ex1[active], ey1[active]
            t = (yc - ay0) / (ay1 - ay0)
            xi = ax0 + t * (ax1 - ax0)
            if rule == "evenodd":
                inside = (xs_c[None, :] > xi[:, None]).sum(axis=0) % 2 == 1
            else:
                wind = np.where(ay1 > ay0, 1, -1)
                inside = (
                    (xs_c[None, :] > xi[:, None]) * wind[:, None]
                ).sum(axis=0) != 0
            if not inside.any():
                continue
            row = img[py]
            if alpha >= 1.0:
                row[inside, 0] = rgb[0]
                row[inside, 1] = rgb[1]
                row[inside, 2] = rgb[2]
                row[inside, 3] = 255
            else:  # source-over with straight alpha
                a = alpha
                dst = row[inside].astype(np.float64)
                da = dst[:, 3] / 255.0
                oa = a + da * (1 - a)
                safe = np.where(oa > 0, oa, 1.0)
                out_rgb = (np.array(rgb, np.float64)[None, :] * a
                           + dst[:, :3] * da[:, None] * (1 - a)) / safe[:, None]
                row[inside, :3] = np.clip(np.rint(out_rgb), 0, 255)
                row[inside, 3] = np.clip(np.rint(oa * 255), 0, 255)
    return img


def decode_svg(data: bytes, max_side: int = 2048) -> np.ndarray:
    """SVG bytes → (h, w, 4) uint8 RGBA (see module docstring for the
    exact subset and sampling semantics)."""
    try:
        root = ET.fromstring(data.decode("utf-8", "replace"))
    except ET.ParseError as exc:
        raise ValueError(f"SVG: XML parse error: {exc}") from exc
    if root.tag.rsplit("}", 1)[-1] != "svg":
        raise ValueError("SVG: root element is not <svg>")
    vb = root.get("viewBox")
    w_attr, h_attr = root.get("width"), root.get("height")
    if vb:
        vx, vy, vw, vh = (float(v) for v in re.findall(
            r"-?\d*\.?\d+(?:[eE][-+]?\d+)?", vb)[:4])
        w = int(round(_num(w_attr, vw)))
        h = int(round(_num(h_attr, vh)))
        base = (w / vw if vw else 1.0, h / vh if vh else 1.0,
                -vx * (w / vw if vw else 1.0),
                -vy * (h / vh if vh else 1.0))
    else:
        w = int(round(_num(w_attr, 0)))
        h = int(round(_num(h_attr, 0)))
        base = (1.0, 1.0, 0.0, 0.0)
    if w <= 0 or h <= 0:
        raise ValueError("SVG: no positive raster size (width/height "
                         "or viewBox required)")
    if w > max_side or h > max_side:
        raise ValueError(f"SVG: raster {w}x{h} exceeds max_side={max_side}")

    shapes: list = []

    def walk(el, xf, fill, opacity, rule):
        tag = el.tag.rsplit("}", 1)[-1]
        xf = _compose(xf, _parse_transform(el.get("transform")))
        style = dict(
            kv.split(":", 1) for kv in
            (el.get("style") or "").split(";") if ":" in kv
        )
        f_attr = el.get("fill", style.get("fill", "").strip() or None)
        if f_attr is not None:
            fill = _parse_color(f_attr)
        o_attr = el.get("fill-opacity",
                        style.get("fill-opacity", "").strip() or None)
        if o_attr is not None:
            opacity = min(1.0, max(0.0, _num(o_attr, 1.0)))
        r_attr = el.get("fill-rule",
                        style.get("fill-rule", "").strip() or None)
        if r_attr in ("nonzero", "evenodd"):
            rule = r_attr
        if tag in ("g", "svg"):
            for child in el:
                walk(child, xf, fill, opacity, rule)
            return
        rings = _shape_rings(el)
        if rings and fill is not None and opacity > 0:
            sx, sy, tx, ty = xf
            rings = [[(sx * x + tx, sy * y + ty) for x, y in ring]
                     for ring in rings]
            shapes.append((rings, fill, opacity, rule))

    # default fill is black per spec
    walk(root, base, (0, 0, 0), 1.0, "nonzero")
    return rasterize_shapes(shapes, w, h)
