"""Interactive map preview HTML (closes the last render non-goal).

Reference surface: render_netcdf --interactive writes an index.html that
drops each rendered PNG as a Leaflet ImageOverlay with a layer selector,
opacity slider, and the legend image
(/root/reference/trefoil/cli/render_netcdf.py:370-383, anchors rule
cli/utilities.py:110-116: [[ymin, xmin], [ymax, xmax]] in WGS84).

This is our own template (vanilla JS, no d3/jinja dependency) with the
same contract; Leaflet loads from its public CDN at view time — nothing
is fetched at build time.
"""

from __future__ import annotations

import json
import os

from ..grid.bbox import BBox

_TEMPLATE = """<!DOCTYPE html>
<html>
<head>
<meta charset="utf-8">
<title>{title} — trefoil_spark preview</title>
<link rel="stylesheet" href="https://unpkg.com/leaflet@1.9.4/dist/leaflet.css"/>
<script src="https://unpkg.com/leaflet@1.9.4/dist/leaflet.js"></script>
<style>
  html, body {{ height: 100%; margin: 0; }}
  #bar {{ padding: 6px 10px; font: 14px sans-serif; }}
  #map {{ position: absolute; top: 34px; bottom: 0; left: 0; right: 0; }}
  #legend {{ position: absolute; z-index: 1000; bottom: 20px; right: 10px;
            background: rgba(255,255,255,.95); padding: 6px;
            border-radius: 6px; font: 13px sans-serif; }}
</style>
</head>
<body>
<div id="bar">
  <label>Layer: <select id="sel"></select></label>
  <label style="margin-left:16px">Opacity:
    <input id="op" type="range" min="0" max="100" value="100"/></label>
</div>
<div id="map"></div>
<div id="legend"><b>{title}</b><br/><img src="{legend_src}"/></div>
<script>
var layers = {layers_json};
var anchors = {anchors_json};
var map = L.map('map');
L.tileLayer('https://tile.openstreetmap.org/{{z}}/{{x}}/{{y}}.png',
            {{attribution: '&copy; OpenStreetMap contributors'}}).addTo(map);
var names = Object.keys(layers).sort();
var overlay = L.imageOverlay(layers[names[0]], anchors).addTo(map);
map.fitBounds(anchors);
var sel = document.getElementById('sel');
names.forEach(function(n) {{
  var o = document.createElement('option'); o.value = n; o.text = n;
  sel.appendChild(o);
}});
sel.onchange = function() {{ overlay.setUrl(layers[sel.value]); }};
document.getElementById('op').oninput = function() {{
  overlay.setOpacity(this.value / 100);
}};
</script>
</body>
</html>
"""


def get_leaflet_anchors(bbox: BBox) -> list[list[float]]:
    """[[ymin, xmin], [ymax, xmax]] in WGS84 (reference
    cli/utilities.py:110-116)."""
    b = bbox.project("EPSG:4326")
    return [[b.ymin, b.xmin], [b.ymax, b.xmax]]


def map_html(
    layers: dict[str, str],
    bbox: BBox,
    variable: str = "layer",
    legend_src: str | None = None,
) -> str:
    """The preview page: {layer name → image URL} as selectable
    ImageOverlays anchored at the bbox."""
    return _TEMPLATE.format(
        title=variable,
        legend_src=legend_src or f"{variable}_legend.png",
        layers_json=json.dumps(layers, sort_keys=True),
        anchors_json=json.dumps(get_leaflet_anchors(bbox)),
    )


def write_map_preview(
    output_dir: str,
    tiles,
    spec,
    renderer,
    variable: str = "synth",
    max_frames: int = 64,
) -> str:
    """End-to-end preview: render each timestep to <var>_<t>.png, write
    the legend image and index.html. Returns the index.html path.

    Driver-safety: nothing unbounded is collected. The prepass is a
    per-timestep tile COUNT (≤ one row per timestep, capped by
    ``max_frames``); single-tile frames collect exactly one PNG each, and
    multi-tile frames go through ``stitch_window``, which enforces its
    own ``max_pixels`` guard — an oversized tile table raises instead of
    OOMing the driver."""
    from pyspark.sql import functions as F

    from ..functions.format import legend_image_png
    from .render import render_tiles
    from .window_ops import stitch_window

    os.makedirs(output_dir, exist_ok=True)
    # bounded prepass: one row per timestep
    frames = sorted(
        (int(r["t"]), int(r["n"]))
        for r in tiles.groupBy("t").agg(F.count(F.lit(1)).alias("n"))
        .limit(max_frames + 1).collect()
    )
    if len(frames) > max_frames:
        raise ValueError(
            f"write_map_preview: more than {max_frames} timesteps; "
            "a preview page with that many ImageOverlays is not useful — "
            "filter the tile table or raise max_frames explicitly"
        )
    single = [t for t, n in frames if n == 1]
    layers: dict[str, str] = {}
    if single:
        rendered = render_tiles(
            tiles.filter(F.col("t").isin(single)), renderer
        ).collect()  # bounded: one PNG per single-tile frame
        for r in rendered:
            name = f"{variable}_{int(r['t'])}.png"
            with open(os.path.join(output_dir, name), "wb") as f:
                f.write(bytes(r["png"]))
            layers[f"t={int(r['t'])}"] = name
    for t, n in frames:
        if n == 1:
            continue
        # stitch via the max_pixels-guarded dense-array export, then
        # render the full frame once
        name = f"{variable}_{t}.png"
        arr = stitch_window(tiles.filter(tiles["t"] == t), spec, spec.bbox, t=t)
        with open(os.path.join(output_dir, name), "wb") as f:
            f.write(renderer.render_png(arr.astype(float)))
        layers[f"t={t}"] = name

    legend_name = f"{variable}_legend.png"
    with open(os.path.join(output_dir, legend_name), "wb") as f:
        f.write(legend_image_png(renderer))

    index = os.path.join(output_dir, "index.html")
    with open(index, "w") as f:
        f.write(map_html(layers, spec.bbox, variable, legend_src=legend_name))
    return index
