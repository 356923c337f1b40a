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
) -> str:
    """End-to-end preview: render each timestep to <var>_<t>.png, write
    the legend image and index.html. Returns the index.html path."""
    from ..functions.format import legend_image_png
    from .render import render_tiles

    os.makedirs(output_dir, exist_ok=True)
    rendered = render_tiles(tiles, renderer).collect()
    # assemble one PNG per timestep: single-tile grids write directly;
    # multi-tile grids go through the stitched window export
    layers: dict[str, str] = {}
    by_t: dict[int, list] = {}
    for r in rendered:
        by_t.setdefault(int(r["t"]), []).append(r)
    for t, rows in sorted(by_t.items()):
        name = f"{variable}_{t}.png"
        if len(rows) == 1:
            with open(os.path.join(output_dir, name), "wb") as f:
                f.write(bytes(rows[0]["png"]))
        else:
            # stitch via the dense-array export + re-render full frame
            from .window_ops import stitch_window

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
