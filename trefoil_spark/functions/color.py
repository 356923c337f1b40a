"""Color model + palette interpolation (SURVEY.md F7-F9).

Reference semantics: /root/reference/trefoil/utilities/color.py —
Color (hex/hsv/float round-trips, :9-105), vectorized RGB↔HSV
(matplotlib-style algorithm, :109-209), interpolate_linear with the
hue-specific rules incl. the grey-ramp rule (:212-285). Reimplemented
from the published algorithm, validated against the reference's own
renderer test palettes (tests/test_render.py).

All of this is driver-side (palettes are ≤256 entries) and broadcast to
executors inside renderer objects.
"""

from __future__ import annotations

import colorsys

import numpy as np


class Color:
    def __init__(self, red: int, green: int, blue: int, alpha: int | None = None):
        self.red, self.green, self.blue, self.alpha = red, green, blue, alpha
        self._has_alpha = alpha is not None

    def __repr__(self):
        return str(self.to_tuple())

    def __eq__(self, other):
        return isinstance(other, Color) and self.to_tuple() == other.to_tuple()

    def to_tuple(self):
        v = [self.red, self.green, self.blue]
        if self._has_alpha:
            v.append(self.alpha)
        return tuple(v)

    def to_hex(self) -> str:
        s = "".join(f"{x:02x}" for x in (self.red, self.green, self.blue))
        if all(s[i] == s[i + 1] for i in (0, 2, 4)):
            s = s[0] + s[2] + s[4]
        return f"#{s}".upper()

    def to_float(self):
        v = [x / 255.0 for x in (self.red, self.green, self.blue)]
        if self._has_alpha:
            v.append(self.alpha / 255.0)
        return tuple(v)

    def to_hsv(self):
        h, s, v = colorsys.rgb_to_hsv(*self.to_float()[:3])
        out = [int(round(h * 360)), int(round(s * 100)), int(round(v * 100))]
        if self._has_alpha:
            out.append(self.alpha)
        return tuple(out)

    @classmethod
    def from_hsv(cls, hue: int, saturation: int, value: int, alpha: int | None = None):
        rgb = colorsys.hsv_to_rgb(hue / 360.0, saturation / 100.0, value / 100.0)
        r, g, b = (int(round(x * 255, 0)) for x in rgb)
        return cls(r, g, b, alpha=alpha)

    @classmethod
    def from_hex(cls, value: str, alpha: int | None = None):
        try:
            if value.startswith("#"):
                value = value[1:]
            if len(value) == 3:
                value = "".join(c * 2 for c in value)
            if len(value) == 6:
                value = f"{value}{alpha if alpha is not None else 255:02X}"
            if len(value) != 8:
                raise ValueError
            return cls(*(int(value[i : i + 2], 16) for i in range(0, 8, 2)))
        except ValueError:
            raise ValueError(f"Invalid hex color: {value}")


def rgb_to_hsv(colors: np.ndarray) -> np.ndarray:
    """uint8 (N,3) RGB → float (N,3) HSV in [0,1] (standard algorithm)."""
    c = np.asarray(colors).astype(np.uint8) / 255.0
    v = c.max(-1)
    rng = np.ptp(c, axis=-1)
    s = np.where(v > 0, rng / np.where(v > 0, v, 1.0), 0.0)
    h = np.zeros_like(v)
    nz = rng > 0
    safe = np.where(nz, rng, 1.0)
    r, g, b = c[..., 0], c[..., 1], c[..., 2]
    is_r = (r == v) & nz
    is_g = (g == v) & nz
    is_b = (b == v) & nz
    h[is_r] = ((g - b) / safe)[is_r]
    h[is_g] = (2.0 + (b - r) / safe)[is_g]
    h[is_b] = (4.0 + (r - g) / safe)[is_b]
    h = (h / 6.0) % 1.0
    return np.stack([h, s, v], axis=-1)


def hsv_to_rgb(colors: np.ndarray) -> np.ndarray:
    """float (N,3) HSV in [0,1] → uint8 (N,3) RGB (standard algorithm)."""
    c = np.asarray(colors, dtype=np.float64)
    h, s, v = c[..., 0], c[..., 1], c[..., 2]
    i = (h * 6.0).astype(int)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    sel = i % 6
    r = np.choose(sel, [v, q, p, p, t, v])
    g = np.choose(sel, [t, v, v, q, p, p])
    b = np.choose(sel, [p, p, t, v, v, q])
    grey = s == 0
    r = np.where(grey, v, r)
    g = np.where(grey, v, g)
    b = np.where(grey, v, b)
    return (np.stack([r, g, b], axis=-1) * 255).astype(np.uint8)


def interpolate_linear(colors, values, num_colors: int, colorspace: str = "hsv") -> np.ndarray:
    """Palette interpolation — reference color.py:212-285 semantics:
    positions from values; rgb = per-channel numpy.interp; hsv = interp
    S and V, hue piecewise with the grey-ramp rule (a segment from/to a
    zero-saturation color holds the other end's hue so the ramp doesn't
    sweep through unrelated hues); alpha interpolated linearly if present.
    """
    colors = np.asarray(colors).astype(np.uint8)
    assert colors.ndim == 2 and colors.shape[0] > 1
    assert len(colors) == len(values)

    min_value = min(values)
    value_range = max(values) - min_value
    factor = 1.0 if value_range == 0 else float(num_colors - 1) / value_range
    target_x = np.arange(0, num_colors)
    x = [(v - min_value) * factor for v in values]

    if colorspace == "rgb":
        out = np.zeros((colors.shape[1], num_colors))
        for i in range(colors.shape[1]):
            out[i] = np.interp(target_x, x, colors[:, i])
        return out.T.astype(np.uint8)

    hsv = rgb_to_hsv(colors[..., :3]).T
    target = np.zeros((3, num_colors))
    for i in (1, 2):  # saturation + value: plain interp
        target[i] = np.interp(target_x, x, hsv[i])
    # hue: piecewise with grey-ramp rule
    for i in range(1, hsv.shape[1]):
        lo_h, hi_h = hsv[0][i - 1], hsv[0][i]
        lo_s, hi_s = hsv[1][i - 1], hsv[1][i]
        lo_x, hi_x = x[i - 1], x[i]
        lo_idx = int(np.searchsorted(target_x, lo_x, side="left"))
        hi_idx = int(np.searchsorted(target_x, hi_x, side="left"))
        if hi_idx == len(target_x) - 1:
            hi_idx = len(target_x)
        if lo_s == 0:
            lo_h = hi_h
        elif hi_s == 0:
            hi_h = lo_h
        target[0][lo_idx:hi_idx] = np.interp(
            target_x[lo_idx:hi_idx], [lo_x, hi_x], [lo_h, hi_h]
        )
    rgb = hsv_to_rgb(target.T)
    if colors.shape[1] == 4:
        a = np.interp(target_x, x, colors[..., 3]).astype(np.uint8)
        return np.column_stack([rgb, a]).astype(np.uint8)
    return rgb
