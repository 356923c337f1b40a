"""Render-to-image tiling (SURVEY.md F2/F5/F6/F10/S8).

Renderer semantics from the reference (reimplemented, PIL-free):
- base colormap sort + palette + background index appended after palette,
  transparent when background alpha == 0
  (/root/reference/trefoil/render/renderers/__init__.py:11-93)
- StretchedRenderer: linear value→index stretch, palette via
  interpolate_linear, palette_size 90/255 rule (stretched.py:17-47,106-133)
- ClassifiedRenderer: numpy.digitize breaks (classified.py:61-68)
- UniqueValuesRenderer: LUT gather for small uint domains, equality scan
  otherwise (unique.py:45-63)
- JSON (de)serialization (renderers/utilities.py:30-65)

Output images are paletted PNGs from the pure-python encoder
(functions/png.py) — byte-stable across runs.

The distributed operator ``render_tiles`` maps each 256x256 tile to PNG
bytes in one Arrow batch pass (mapInPandas) — the classic XYZ tile
pyramid job; at scale this is embarrassingly parallel and shuffle-free.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..functions.color import Color, interpolate_linear
from ..functions.png import encode_palette_png, encode_rgb_png

RENDERED_SCHEMA = "var string, t int, ty int, tx int, png binary"


class RasterRenderer:
    def __init__(self, colormap, fill_value=None, background_color=None):
        if background_color is None:
            background_color = Color(0, 0, 0, 0)
        self.colormap = sorted(list(colormap), key=lambda x: x[0])
        self.fill_value = fill_value
        self.background_color = background_color
        self.values = np.array([entry[0] for entry in self.colormap])
        self._generate_palette()

    @property
    def name(self):
        return self.__class__.__name__.lower().replace("renderer", "").replace("values", "")

    def _mask(self, data: np.ndarray) -> np.ndarray:
        """NaN + fill_value → masked (True where masked)."""
        mask = np.isnan(data)
        if self.fill_value is not None:
            mask |= data == self.fill_value
        return mask

    def _indices(self, data: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def render_png(self, data: np.ndarray) -> bytes:
        """2-D float array → paletted PNG bytes (masked → background index)."""
        idx = self._indices(data)
        background_index = self.palette.shape[0]
        idx = np.where(self._mask(data), background_index, idx).astype(np.uint8)
        pal = np.vstack([self.palette[..., :3],
                         np.array(self.background_color.to_tuple()[:3], dtype=np.uint8)])
        transparent = (
            background_index if self.background_color.alpha == 0 else None
        )
        return encode_palette_png(idx, pal, transparent)

    def serialize(self) -> dict:
        ret = {
            "type": self.name,
            "colors": [(entry[0], entry[1].to_hex()) for entry in self.colormap],
        }
        if self.fill_value is not None:
            ret["options"] = {"fill_value": self.fill_value}
        return ret

    def to_json(self, indent=4) -> str:
        return json.dumps(self.serialize(), indent=indent)


class StretchedRenderer(RasterRenderer):
    def __init__(self, colormap, fill_value=None, background_color=None,
                 method="linear", colorspace="hsv", palette_size=None):
        assert len(colormap) >= 2
        self.method = method
        self.colorspace = colorspace
        if palette_size is not None:
            assert palette_size <= 255
            self.palette_size = palette_size
        elif len(colormap) > 20:
            self.palette_size = 255
        else:
            self.palette_size = 90
        super().__init__(colormap, fill_value, background_color)

    def _generate_palette(self):
        self.min_value = self.colormap[0][0]
        self.max_value = self.colormap[-1][0]
        colors = np.asarray([c[1].to_tuple() for c in self.colormap]).astype(np.uint8)
        if self.method != "linear":
            raise NotImplementedError("Other stretched render methods not built!")
        self.palette = interpolate_linear(
            colors, self.values, self.palette_size, colorspace=self.colorspace
        )

    def _indices(self, data: np.ndarray) -> np.ndarray:
        # stretched.py:106-121: trunc toward zero then clip
        num_colors = self.palette.shape[0]
        factor = (
            1.0
            if self.min_value == self.max_value
            else float(num_colors - 1) / float(self.max_value - self.min_value)
        )
        safe = np.where(self._mask(data), self.min_value, data)
        return ((safe - self.min_value) * factor).astype(int).clip(0, num_colors - 1)

    def serialize(self):
        ret = super().serialize()
        ret.setdefault("options", {})["color_space"] = self.colorspace
        return ret


class ClassifiedRenderer(RasterRenderer):
    def __init__(self, colormap, fill_value=None, background_color=None):
        assert len(colormap) >= 2
        super().__init__(colormap, fill_value, background_color)

    def _generate_palette(self):
        self.palette = np.asarray(
            [entry[1].to_tuple() for entry in self.colormap]
        ).astype(np.uint8)

    def _indices(self, data: np.ndarray) -> np.ndarray:
        # classified.py:61-68 — RAW digitize, deliberately unclipped: a
        # value >= the last break lands on index len(palette), which IS the
        # background index (the reference's digitize-vs-docstring quirk;
        # we follow the implementation, SURVEY.md F2)
        safe = np.where(self._mask(data), self.values[0], data)
        return np.digitize(safe.ravel(), self.values).reshape(data.shape)


class UniqueValuesRenderer(RasterRenderer):
    def __init__(self, colormap, fill_value=None, background_color=None, labels=None):
        assert len(colormap) > 0
        super().__init__(colormap, fill_value, background_color)
        if labels:
            assert len(colormap) == len(labels)
            self.labels = list(labels)
        else:
            self.labels = []

    def _generate_palette(self):
        self.palette = np.asarray(
            [entry[1].to_tuple() for entry in self.colormap]
        ).astype(np.uint8)

    def _indices(self, data: np.ndarray) -> np.ndarray:
        # unique.py:45-63: unmapped values → background index
        out = np.full(data.shape, self.values.shape[0], dtype=np.int64)
        for index, value in enumerate(self.values):
            out[data == value] = index
        return out

    def serialize(self):
        ret = super().serialize()
        if self.labels:
            ret.setdefault("options", {})["labels"] = list(self.labels)
        return ret


AVAILABLE_RENDERERS = {
    "classified": ClassifiedRenderer,
    "stretched": StretchedRenderer,
    "unique": UniqueValuesRenderer,
}


def renderer_from_dict(d: dict) -> RasterRenderer:
    """Reference renderers/utilities.py:30-65 factory semantics."""
    options = d.get("options", {})
    try:
        rtype = d["type"]
        colors = [(float(x[0]), Color.from_hex(x[1])) for x in d["colors"]]
    except KeyError:
        raise ValueError("Missing required keys from renderer configuration")
    fill_value = options.get("fill_value")
    if fill_value is not None:
        fill_value = float(fill_value)
    kwargs = {
        "colormap": colors,
        "fill_value": fill_value,
        "background_color": Color(255, 255, 255, 0),
    }
    if rtype == "stretched":
        cs = options.get("color_space", "hsv").lower().strip()
        if cs not in ("rgb", "hsv"):
            raise ValueError(f"Invalid color space: {cs}")
        return StretchedRenderer(colorspace=cs, **kwargs)
    if rtype == "classified":
        return ClassifiedRenderer(**kwargs)
    if rtype == "unique":
        labels = [str(x) for x in options.get("labels", [])]
        return UniqueValuesRenderer(labels=labels, **kwargs)
    raise ValueError(f"Unknown renderer type: {rtype}")


def render_tiles(tiles: DataFrame, renderer: RasterRenderer) -> DataFrame:
    """Tile DataFrame → (var, t, ty, tx, png) — shuffle-free map job.

    The renderer object rides the task closure (broadcast pattern);
    each tile is one vectorized render + one deterministic PNG encode.
    """

    def gen(batches):
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                blk = np.frombuffer(row.block, dtype=np.float32).reshape(row.h, row.w)
                rows.append(
                    (row.var, int(row.t), int(row.ty), int(row.tx),
                     renderer.render_png(blk.astype(np.float64)))
                )
            yield pd.DataFrame(rows, columns=["var", "t", "ty", "tx", "png"])

    return tiles.mapInPandas(gen, schema=RENDERED_SCHEMA)


def render_image_png(
    renderer: RasterRenderer,
    data: np.ndarray,
    scale: int = 1,
    flip_y: bool = False,
) -> bytes:
    """F11 — the reference's render_image surface
    (cli/utilities.py:16-34): optional y-flip + integer upscale + PNG.

    Byte-stable palette fast path (integer scale, nearest). The full
    reference surface — LANCZOS resampling, fractional scales, JPEG —
    lives in :func:`render_image_bytes`."""
    if scale < 1 or int(scale) != scale:
        raise ValueError("scale must be a positive integer")
    if flip_y:
        data = data[::-1]
    idx = renderer._indices(data)
    background_index = renderer.palette.shape[0]
    idx = np.where(renderer._mask(data), background_index, idx).astype(np.uint8)
    if scale != 1:
        idx = np.repeat(np.repeat(idx, scale, axis=0), scale, axis=1)
    pal = np.vstack([
        renderer.palette[..., :3],
        np.array(renderer.background_color.to_tuple()[:3], dtype=np.uint8),
    ])
    transparent = background_index if renderer.background_color.alpha == 0 else None
    return encode_palette_png(idx, pal, transparent)


def render_image_bytes(
    renderer: RasterRenderer,
    data: np.ndarray,
    scale: float = 1,
    flip_y: bool = False,
    format: str = "png",
    resampling: str = "lanczos",
    quality: int = 85,
) -> bytes:
    """F11 — the reference's full render_image surface
    (cli/utilities.py:16-34): y-flip, resize with LANCZOS (or nearest),
    save as PNG or JPEG.

    Mirrors the reference's order of operations: render first, then
    resample the RGBA *composite* (PIL resizes the rendered image, not
    the data). `format='jpg'` drops the alpha channel exactly like PIL's
    ``convert('RGB')`` and encodes PROGRESSIVE JFIF (own ITU T.81 codec,
    SOF2 spectral selection — the reference's ``progressive=True``).
    `format='webp'` keeps RGBA and encodes lossless VP8L (own codec,
    literal subset) matching the reference's ``lossless=True``. The
    nearest+integer-scale+PNG combination routes through the byte-stable
    paletted fast path."""
    from ..functions.jpeg import encode_jpeg
    from ..functions.resample import resample_lanczos
    from ..functions.webp import encode_webp

    fmt = format.lower().lstrip(".")
    fmt = "jpg" if fmt == "jpeg" else fmt
    if fmt not in ("png", "jpg", "webp"):
        raise ValueError(f"Unsupported format: {format!r} (png, jpg, webp)")
    if resampling not in ("nearest", "lanczos"):
        raise ValueError(f"Unsupported resampling: {resampling!r}")
    if scale <= 0:
        raise ValueError("scale must be positive")
    if fmt == "png" and resampling == "nearest" and float(scale).is_integer():
        if flip_y:
            data = data[::-1]
        return render_image_png(renderer, data, int(scale))
    rgba = render_rgba(renderer, data, scale=scale, flip_y=flip_y,
                       resampling=resampling)
    if fmt == "jpg":
        return encode_jpeg(rgba[..., :3], quality=quality, progressive=True)
    if fmt == "webp":
        return encode_webp(rgba)
    return encode_rgb_png(rgba)


def render_rgba(
    renderer: RasterRenderer,
    data: np.ndarray,
    scale: float = 1,
    flip_y: bool = False,
    resampling: str = "lanczos",
) -> np.ndarray:
    """Rendered (H, W, 4) uint8 RGBA composite — the array behind
    :func:`render_image_bytes`, exposed for sinks that need pixels with
    their own container (e.g. the georeferenced RGB GeoTIFF export)."""
    from ..functions.resample import resample_lanczos

    if flip_y:
        data = data[::-1]
    h, w = data.shape
    # reference target size: numpy.array(data.shape[::-1]) * scale, cast uint
    out_w, out_h = int(w * scale), int(h * scale)
    idx = renderer._indices(data)
    bg_index = renderer.palette.shape[0]
    idx = np.where(renderer._mask(data), bg_index, idx).astype(np.int64)
    pal = renderer.palette
    bg = renderer.background_color.to_tuple()
    rgb_tab = np.vstack([pal[..., :3], np.array(bg[:3])[None, :]]).astype(np.uint8)
    if pal.shape[1] == 4:
        a_rows = pal[..., 3]
    else:
        a_rows = np.full(pal.shape[0], 255)
    a_tab = np.concatenate([a_rows, [bg[3]]]).astype(np.uint8)
    rgba = np.dstack([rgb_tab[idx], a_tab[idx]])

    if (out_h, out_w) != (h, w):
        if resampling == "lanczos":
            rgba = resample_lanczos(rgba, out_h, out_w)
        else:
            sy = np.clip(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), 0, h - 1)
            sx = np.clip(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64), 0, w - 1)
            rgba = rgba[sy][:, sx]
    return rgba
