"""Precision formatter + legend building (SURVEY.md F13/F12).

F13 — reference semantics (/root/reference/trefoil/utilities/format.py:
5-33): scan a value set once to find the smallest decimal precision that
represents every value's fractional part under ``%g`` (capped at 6, the
point past which Python's repr truncates anyway), then format each value
at that precision with trailing zeros (and a bare trailing dot) removed.
The reference counts the sign character of negative fractional parts
toward precision (an off-by-one for all-negative inputs); parity keeps
that observable behavior, noted here.

F12 — legend: the reference composites PIL images with TrueType labels
(/root/reference/trefoil/render/renderers/legend.py:7-78). PIL/fonts are
absent here, so the legend surfaces as (a) structured rows — label,
color, tick position — the JSON a web client actually wants, and (b) a
color-strip PNG via the engine's own encoder. Text rasterization stays
a declared non-goal (SURVEY §7.3).
"""

from __future__ import annotations

import numpy as np

from .png import encode_palette_png

MAX_PRECISION = 6


class PrecisionFormatter:
    """Minimal-precision numeric labels for a value set."""

    def __init__(self, values, max_precision: int = MAX_PRECISION):
        if max_precision > MAX_PRECISION:
            raise ValueError(f"max_precision must be <= {MAX_PRECISION}")
        need = 0
        for x in values:
            frac = "{:g}".format(float(x) - int(round(x)))
            if frac != "0":
                # "0.125" → 3 digits after the leading "0." (the
                # reference's len-2 rule, sign quirk included)
                need = max(need, len(frac) - 2)
        self.precision = min(need, max_precision, MAX_PRECISION)

    def format(self, value) -> str:
        if self.precision == 0:
            return str(int(round(float(value), 0)))
        s = f"{float(value):.{self.precision}f}"
        return s.rstrip("0").rstrip(".")


def format_labels(values) -> list[str]:
    fmt = PrecisionFormatter(values)
    return [fmt.format(v) for v in values]


def legend_elements(renderer) -> list[dict]:
    """Structured legend rows for a renderer: one per colormap entry,
    labels via PrecisionFormatter (or the renderer's explicit labels),
    ticks normalized bottom(0)→top(1) like the reference's
    LegendElement."""
    values = [v for v, _c in renderer.colormap]
    colors = [c for _v, c in renderer.colormap]
    labels = getattr(renderer, "labels", None) or format_labels(values)
    n = len(values)
    out = []
    for i, (v, c, lab) in enumerate(zip(values, colors, labels)):
        out.append(
            {
                "value": float(v),
                "label": str(lab),
                "color": c.to_hex(),
                "tick": (i / (n - 1)) if n > 1 else 1.0,
            }
        )
    return out


def legend_strip_png(renderer, width: int = 20, patch_height: int = 16) -> bytes:
    """Vertical color-strip legend image (first colormap entry at the
    top, matching the reference's composite order) — own PNG encoder,
    byte-stable."""
    colors = [c for _v, c in renderer.colormap]
    n = len(colors)
    idx = np.repeat(np.arange(n, dtype=np.uint8), patch_height)[:, None]
    img = np.broadcast_to(idx, (n * patch_height, width))
    palette = [c.to_tuple()[:3] for c in colors]
    return encode_palette_png(np.ascontiguousarray(img), palette)
